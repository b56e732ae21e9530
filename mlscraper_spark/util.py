"""Small shared helpers.

``dedupe_preserving_order`` is the contract of the reference's
``no_duplicates_generator_decorator`` (``/root/reference/mlscraper/util.py:8-16``,
pinned by ``/root/reference/tests/test_util.py``): suppress duplicates while
preserving first-seen order.  Realized with ``dict.fromkeys`` instead of a
generator decorator — same observable behavior, no closure state.
"""
from __future__ import annotations

from typing import Iterable, TypeVar

T = TypeVar("T")


def dedupe_preserving_order(items: Iterable[T]) -> list[T]:
    return list(dict.fromkeys(items))
