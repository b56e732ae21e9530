"""Selector generation + uniqueness, ported from
/root/reference/tests/test_selectors.py."""
from mlscraper_spark.dom.css import PageDOM
from mlscraper_spark.dom.parser import parse_html
from mlscraper_spark.training.matches import PAGE_ROOT
from mlscraper_spark.training.selectors import generate_unique_selectors_for_nodes


def _dom(html):
    return PageDOM(parse_html(html))


def _unique_rules(targets, complexity=100):
    return list(generate_unique_selectors_for_nodes(targets, None, complexity))


def test_basic():
    # test_selectors.py:17-35
    dom1 = _dom('<html><body><p class="test">test</p><p>bla</p></body></html>')
    dom2 = _dom('<html><body><div></div><p class="test">hallo</p></body></html>')
    targets = [
        ("p1", dom1, dom1.select(PAGE_ROOT, "p.test")[0]),
        ("p2", dom2, dom2.select(PAGE_ROOT, "p.test")[0]),
    ]
    rules = _unique_rules(targets)
    assert "p" not in rules, "p is selector but not unique"
    assert "div" not in rules, "div is no common tag"
    assert "body > p.test" not in rules, "body is irrelevant"
    assert ".test" in rules
    assert "p.test" in rules


def test_nth():
    # test_selectors.py:37-45
    dom = _dom(
        b"<html><body><ul><li>target</li><li>noise</li></ul>"
        b"<ul><li>target</li><li>noise</li></ul></body></html>"
    )
    first_lis = [
        dom.select(ul, "li")[0] for ul in dom.select(PAGE_ROOT, "ul")
    ]
    targets = [("p", dom, li) for li in first_lis]
    rules = _unique_rules(targets)
    assert "li:nth-child(1)" in rules


def test_ids():
    # test_selectors.py:47-56
    dom = _dom(
        b'<html><body><div id="target">test</div><div>irrelevant</div></body></html>'
    )
    node = dom.select(PAGE_ROOT, "#target")[0]
    rules = _unique_rules([("p", dom, node)])
    assert "#target" in rules


def test_multi_parents():
    # test_selectors.py:58-63
    dom = _dom(b'<html><body><div id="target"><p>test</p></div><div><p></p></div>')
    node = dom.select(dom.select(PAGE_ROOT, "#target")[0], "p")[0]
    rules = _unique_rules([("p", dom, node)])
    assert "#target p" in rules


def test_itemprop_selector():
    # test_selectors.py:65-74
    dom = _dom(
        b'<html><body><div itemprop="user">lorey</div>'
        b'<div itemprop="user">jonashaag</div></body></html>'
    )
    elements = dom.select(PAGE_ROOT, "div")
    targets = [("p", dom, e) for e in elements]
    rules = _unique_rules(targets)
    assert "div[itemprop]" in rules
    assert 'div[itemprop="user"]' in rules


def test_rules_sorted_by_length_then_lex():
    dom = _dom(b'<html><body><span class="a">x</span></body></html>')
    node = dom.select(PAGE_ROOT, "span")[0]
    rules = _unique_rules([("p", dom, node)])
    keys = [(len(r), r) for r in rules]
    assert keys == sorted(keys), "selector stream must be deterministic"
