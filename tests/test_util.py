"""Port of the reference's util contract (/root/reference/tests/test_util.py):
order-preserving duplicate suppression."""
from mlscraper_spark.util import dedupe_preserving_order


def test_dedupe_preserving_order():
    assert dedupe_preserving_order([1, 1, 2, 3, 3, 3]) == [1, 2, 3]


def test_dedupe_preserving_order_keeps_first_seen():
    assert dedupe_preserving_order(["b", "a", "b", "c", "a"]) == ["b", "a", "c"]
