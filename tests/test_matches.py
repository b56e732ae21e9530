"""Match-scan + extractor semantics, ported from the reference's
tests/test_html.py (find_all cases) and tests/test_matches.py."""
from mlscraper_spark.dom.css import PageDOM
from mlscraper_spark.dom.parser import parse_html
from mlscraper_spark.training.matches import (
    PAGE_ROOT,
    TEXT_EXTRACTOR,
    ValueMatch,
    attr_extractor,
    extract_value,
    is_dimensions_match,
    scan_value_matches,
)


def _dom(html):
    return PageDOM(parse_html(html))


def test_find_text_with_whitespace():
    # test_html.py:96-103: p, body, html all match; the Page does not
    dom = _dom(b"<html><body><p>    whitespace  \n\t </p></body></html>")
    matches = scan_value_matches("p", dom, "whitespace")
    assert len(matches) == 3
    assert {dom.node(m.node_id).tag for m in matches} == {"p", "body", "html"}
    assert all(m.extractor == TEXT_EXTRACTOR for m in matches)


def test_find_all_with_noise_no_text_match():
    # test_html.py:51-57: substring inside noise must NOT match
    dom = _dom(b"<html><body><p>bla karl bla</p></body></html>")
    matches = scan_value_matches("p", dom, "karl")
    assert all(m.extractor != TEXT_EXTRACTOR for m in matches)
    assert not matches


def test_find_all_stackoverflow_href(spark=None):
    from tests.conftest import reference_fixture

    dom = _dom(reference_fixture("so.html"))
    matches = scan_value_matches("so", dom, "/users/624900/jterrace")
    assert matches
    assert any(m.extractor == attr_extractor("href") for m in matches)


def test_is_dimensions_match():
    # test_matches.py:8-19
    dom = _dom(b'<html><body><img height="20" width="20"></body></html>')
    unfiltered = scan_value_matches("p", dom, "20")
    assert unfiltered
    assert not [m for m in unfiltered if not is_dimensions_match(m)]


def test_attribute_extractor():
    # test_matches.py:22-30: missing attribute extracts None
    dom = _dom(
        b'<html><body><a href="https://karllorey.com"></a><a>no link</a></body></html>'
    )
    a_tags = dom.select(PAGE_ROOT, "a")
    ext = attr_extractor("href")
    assert extract_value(dom, a_tags[0], ext) == "https://karllorey.com"
    assert extract_value(dom, a_tags[1], ext) is None


def test_extractor_equality():
    # test_matches.py:33-39: extractor identity drives consensus
    assert attr_extractor("href") == attr_extractor("href")
    assert len({attr_extractor("href"), attr_extractor("href")}) == 1
    assert attr_extractor("href") != TEXT_EXTRACTOR


def test_class_attr_never_text_matches_attribute():
    # bs4 multi-valued attrs compare list-vs-str: class never attr-matches
    dom = _dom(b'<html><body><p class="x">y</p></body></html>')
    assert not [
        m for m in scan_value_matches("p", dom, "x") if m.extractor[0] == "attr"
    ]


def test_similarity_prefers_same_structure():
    from mlscraper_spark.training.matches import node_similarity

    dom = _dom(
        b'<html><body><p class="a">1</p><p class="a">2</p><div class="a">3</div></body></html>'
    )
    p1, p2 = dom.select(PAGE_ROOT, "p")
    d = dom.select(PAGE_ROOT, "div")[0]
    assert node_similarity(dom, p1, dom, p2) == 1.0
    assert node_similarity(dom, p1, dom, d) == 0.0  # tag mismatch
