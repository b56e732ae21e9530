"""The reference's *unreferenced* fixture corpus
(`/root/reference/tests/static/multi/*`, `single/basic/train.html` —
SURVEY.md §5 flags them as future cases no reference test exercises).
These pin how OUR engine behaves on that corpus: the tractable pages
train and round-trip; the documented-hard page fails with the engine's
normal exhaustion error, never a crash."""
import pytest

from mlscraper_spark.training.samples import NoMatchFoundException, Sample, SamplePage, TrainingSet
from mlscraper_spark.training.scrapers import apply_plan_to_html
from mlscraper_spark.training.train import NoScraperFoundException, train_scraper
from tests.conftest import reference_fixture


def _train(pages_values, complexity=100):
    ts = TrainingSet()
    for i, (html, value) in enumerate(pages_values):
        ts.add_sample(Sample(SamplePage(f"s{i}", html), value))
    return train_scraper(ts, complexity=complexity)


def test_single_basic_train():
    html = reference_fixture("single/basic/train.html")
    want = {"name": "Peter", "description": "Cool-looking guy"}
    plan = _train([(html, want)])
    assert apply_plan_to_html(html, plan) == want


def test_single_result_page_list_of_dicts():
    html = reference_fixture("multi/single-result-page.html")
    want = [
        {"title": "One great result!", "description": "Some description"},
        {"title": "Another great result!", "description": "Another description"},
        {"title": "Result to be found", "description": "Description to crawl"},
    ]
    plan = _train([(html, want)], complexity=2)
    assert apply_plan_to_html(html, plan) == want


def test_multivalued_results_list_of_lists():
    html = reference_fixture("multi/multivalued-results.html")
    want = [
        ["Value 1", "Value 2", "Value 3"],
        ["Value 4", "Value 5", "Value 6"],
        ["Value 7", "Value 8"],
    ]
    plan = _train([(html, want)], complexity=2)
    assert apply_plan_to_html(html, plan) == want


def test_inline_results_fail_cleanly():
    """The fixture's own comment: 'difficult because no item has a common
    ancestor and there are no classes' — the list items (h2/p/a triples)
    share no per-item root, so list induction cannot find an item
    selector.  The engine must surface its normal failure, not crash."""
    html = reference_fixture("multi/inline-result-page.html")
    want = [
        {"title": "One great result!", "link": "https://google.de"},
        {"title": "Another great result!", "link": "https://google.de"},
        {"title": "Result to be found", "link": "https://google.de"},
    ]
    with pytest.raises((NoScraperFoundException, NoMatchFoundException)):
        _train([(html, want)], complexity=2)


def test_defined_with_icons_matches_row_containers():
    """Icon-keyed page: names sit as bare text nodes next to <i> icons.
    Reference semantics (html.py:87-97): a matching TEXT NODE is promoted
    to its parent Tag, and training never round-trips values — so the
    trained list scraper selects the row <div>s and extraction yields
    each row's FULL text (names interleaved with the other fields).  We
    pin that exact (reference-faithful) behavior."""
    html = reference_fixture("multi/defined-with-icons.html")
    plan = _train([(html, ["Peter", "Martin", "Frank"])], complexity=2)
    assert plan["selector"] == {"kind": "css", "rule": "div"}
    out = apply_plan_to_html(html, plan)
    assert [row.split("\n")[0] for row in out] == ["Peter", "Martin", "Frank"]
    assert "peter@example.com" in out[0]  # full row text, not just the name
