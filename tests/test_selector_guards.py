"""Search-space guard semantics (SURVEY §2.2 P6-P8) + failure-path parity."""
import pytest

from mlscraper_spark.dom.css import PageDOM
from mlscraper_spark.dom.parser import parse_html
from mlscraper_spark.training.matches import PAGE_ROOT
from mlscraper_spark.training.samples import Sample, SamplePage, TrainingSet
from mlscraper_spark.training.scrapers import apply_plan_to_html
from mlscraper_spark.training.selectors import generate_node_selectors
from mlscraper_spark.training.train import NoScraperFoundException, train_scraper


def _node_selectors(html, css):
    dom = PageDOM(parse_html(html))
    node = dom.select(PAGE_ROOT, css)[0]
    return list(generate_node_selectors(dom, node))


def test_class_char_blacklist():
    # classes with ':' or '/' are unusable (html.py:17-18, :248-249)
    sels = _node_selectors(
        b'<html><body><p class="ok md:flex a/b">x</p></body></html>', "p"
    )
    assert ".ok" in sels
    assert all("md:flex" not in s.split(":nth-child")[0] for s in sels)
    assert all("a/b" not in s for s in sels)


def test_attribute_selector_blacklist():
    # never build [id]/[class]/[rel] selectors (selectors.py:12-13)
    sels = _node_selectors(
        b'<html><body><a id="i" class="c" rel="nofollow" href="/x">y</a></body></html>',
        "a",
    )
    assert "#i" in sels
    assert "a[href]" in sels
    assert not any(s.startswith("a[id") or s.startswith("a[class") or s.startswith("a[rel") for s in sels)


def test_plain_attr_value_guard():
    # values failing the first-char guard get no [attr=value] selector
    # (selectors.py:184-193: re.match tests only the first character)
    sels = _node_selectors(
        b'<html><body><div data-x="9bad" data-y="good one">z</div></body></html>', "div"
    )
    assert 'div[data-y="good one"]' in sels
    assert "div[data-x]" in sels
    assert 'div[data-x="9bad"]' not in sels


def test_id_selectors_skip_nth_child():
    # ids are distinct enough (selectors.py:148-155)
    sels = _node_selectors(b'<html><body><p id="only">x</p></body></html>', "p")
    assert "#only" in sels
    assert not any(s.startswith("#only:nth-child") for s in sels)


def test_bracket_attr_value_never_emitted():
    # ']' inside an attribute value would yield div[data-k="a]b"] — an
    # unparseable rule; the plain-value guard must refuse it
    sels = _node_selectors(
        b'<html><body><div data-k="a]b">x</div></body></html>', "div"
    )
    assert "div[data-k]" in sels
    assert not any('a]b' in s for s in sels)


def test_hostile_attr_value_does_not_crash_training():
    # regression: training on a page whose attr value embeds ']' used to
    # surface SelectorParseError (not NoScraperFoundException) out of
    # train_scraper; must now train fine via another selector
    p = b'<html><body><div data-k="a]b" class="t">val</div><p>other</p></body></html>'
    ts = TrainingSet()
    ts.add_sample(Sample(SamplePage("p1", p), "val"))
    plan = train_scraper(ts)
    assert apply_plan_to_html(p, plan) == "val"


def test_no_match_exhaustion_raises():
    # all combinations fail → NoScraperFoundException (training.py:78)
    # value present only inside attribute on page1 and only as text on
    # page2 → extractor consensus always fails (training.py:108-113)
    p1 = b'<html><body><a href="val">x</a></body></html>'
    p2 = b"<html><body><p>val</p></body></html>"
    ts = TrainingSet()
    ts.add_sample(Sample(SamplePage("p1", p1), "val"))
    ts.add_sample(Sample(SamplePage("p2", p2), "val"))
    with pytest.raises(NoScraperFoundException):
        train_scraper(ts)
