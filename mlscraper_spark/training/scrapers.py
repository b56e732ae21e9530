"""Scraper plans: the trained artifact, as plain JSON-serializable dicts.

The reference's ``Scraper`` tree (``/root/reference/mlscraper/scrapers.py``)
is an object graph interpreted against a soup.  Here a scraper is a *plan* —
a nested dict of selector rules + extractor specs — so it can be broadcast
to executors and applied by vectorized UDFs (SURVEY.md §1.2, §3.2).

Plan grammar::

    value plan: {"type": "value", "selector": SEL, "extractor": EXT}
    dict plan : {"type": "dict", "children": {key: PLAN}}
    list plan : {"type": "list", "selector": SEL, "item": PLAN}
    SEL: {"kind": "css", "rule": str} | {"kind": "pass"}
    EXT: {"kind": "text"} | {"kind": "attr", "attr": str}
"""
from __future__ import annotations

import json

from mlscraper_spark.dom.css import PageDOM
from mlscraper_spark.dom.parser import parse_html
from mlscraper_spark.training.matches import PAGE_ROOT


def css_selector(rule: str) -> dict:
    return {"kind": "css", "rule": rule}


PASS_SELECTOR = {"kind": "pass"}


def value_plan(selector: dict, extractor: dict) -> dict:
    return {"type": "value", "selector": selector, "extractor": extractor}


def dict_plan(children: dict) -> dict:
    return {"type": "dict", "children": children}


def list_plan(selector: dict, item: dict) -> dict:
    return {"type": "list", "selector": selector, "item": item}


def extractor_spec(extractor: tuple) -> dict:
    if extractor[0] == "text":
        return {"kind": "text"}
    return {"kind": "attr", "attr": extractor[1]}


class ExtractionError(Exception):
    """css rule matched nothing in strict mode (selectors.py:41-47)."""


def _select_one(dom: PageDOM, root_id: int, sel: dict, strict: bool) -> int | None:
    if sel["kind"] == "pass":
        return root_id  # selectors.py:28-34
    hits = dom.select(root_id, sel["rule"], limit=1)
    if not hits:
        if strict:
            raise ExtractionError(f"no hit for {sel['rule']!r}")
        return None
    return hits[0]


def apply_plan(dom: PageDOM, root_id: int, plan: dict, strict: bool = False):
    """Interpret a plan against one page — the reference's ``Scraper.get``
    (scrapers.py:17-18, :32-35, :49-50).

    Non-strict mode returns None for missing hits so a distributed
    extraction job never fails a task on one bad page.
    """
    t = plan["type"]
    if t == "value":
        node = _select_one(dom, root_id, plan["selector"], strict)
        if node is None:
            return None
        ext = plan["extractor"]
        rec = dom.node(node)
        if ext["kind"] == "text":
            return rec.text  # stored pre-stripped (matches.py:75-76)
        return rec.attrs.get(ext["attr"])  # None if absent (matches.py:101-103)
    if t == "dict":
        return {
            k: apply_plan(dom, root_id, child, strict)
            for k, child in plan["children"].items()
        }
    if t == "list":
        sel = plan["selector"]
        assert sel["kind"] == "css", "list scraper needs a css selector"
        return [
            apply_plan(dom, item_id, plan["item"], strict)
            for item_id in dom.select(root_id, sel["rule"])
        ]
    raise ValueError(f"unknown plan type {t!r}")


def apply_plan_to_html(html: bytes | str, plan: dict, strict: bool = False):
    dom = PageDOM(parse_html(html))
    return apply_plan(dom, PAGE_ROOT, plan, strict)


def plan_to_json(plan: dict) -> str:
    return json.dumps(plan, sort_keys=True)


def plan_from_json(s: str) -> dict:
    return json.loads(s)
