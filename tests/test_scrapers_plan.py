"""Hand-built scraper plans, ported from /root/reference/tests/test_scrapers.py."""
from mlscraper_spark.training.scrapers import (
    PASS_SELECTOR,
    apply_plan_to_html,
    css_selector,
    dict_plan,
    list_plan,
    plan_from_json,
    plan_to_json,
    value_plan,
)
from tests.conftest import SO_ITEM, reference_fixture

TEXT = {"kind": "text"}


def attr(a):
    return {"kind": "attr", "attr": a}


def test_list_of_dict_scraper_stackoverflow():
    # test_scrapers.py:12-34 — hand-built rules against the real page
    plan = list_plan(
        css_selector(".answer"),
        dict_plan(
            {
                "user": value_plan(css_selector(".user-details a"), attr("href")),
                "upvotes": value_plan(css_selector(".js-vote-count"), TEXT),
                "when": value_plan(css_selector(".user-action-time span"), attr("title")),
            }
        ),
    )
    assert apply_plan_to_html(reference_fixture("so.html"), plan) == SO_ITEM


def test_dict_scraper():
    item = {"h": "no 1", "t": "the first one"}
    html = "<html><body><div><h1>no 1</h1><p>the first one</p></div></body></html>"
    plan = dict_plan(
        {
            "h": value_plan(css_selector("h1"), TEXT),
            "t": value_plan(css_selector("p"), TEXT),
        }
    )
    assert apply_plan_to_html(html, plan) == item


def test_value_scraper():
    plan = value_plan(css_selector(".test"), TEXT)
    assert apply_plan_to_html(
        '<html><body><p class="test">test</p><p>bla</p></body></html>', plan
    ) == "test"
    assert apply_plan_to_html(
        '<html><body><div></div><p class="test">hallo</p></body></html>', plan
    ) == "hallo"


def test_list_of_values_scraper():
    plan = list_plan(css_selector("p"), value_plan(PASS_SELECTOR, TEXT))
    assert apply_plan_to_html(
        b"<html><body><p>a</p><i>noise</i><p>b</p><p>c</p></body></html>", plan
    ) == ["a", "b", "c"]


def test_plan_json_roundtrip():
    plan = list_plan(css_selector("p"), value_plan(PASS_SELECTOR, TEXT))
    assert plan_from_json(plan_to_json(plan)) == plan
