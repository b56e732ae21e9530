"""End-to-end north-star flow: train a scraper from examples, crawl, apply
the trained plan + image extraction per epoch, validate payload rows."""
import json

from mlscraper_spark.crawl.engine import (
    CrawlConfig,
    read_extractions,
    read_fetch_log,
    read_images,
    run_crawl,
)
from mlscraper_spark.crawl.synthweb import (
    WebConfig,
    author_for,
    captions_for,
    fetch,
    parse_page_url,
)
from mlscraper_spark.training.samples import Sample, SamplePage, TrainingSet
from mlscraper_spark.training.train import train_scraper

WEB = WebConfig(n_hosts=8, max_pages_per_host=12)


def _trained_plan():
    """Train on two synthetic pages (example-driven, reference semantics)."""
    ts = TrainingSet()
    for url in ["http://host0.test/page/0", "http://host1.test/page/1"]:
        _, html = fetch(url, WEB)
        i, j = parse_page_url(url, WEB)
        ts.add_sample(Sample(SamplePage(url, html), author_for(i, j)))
    return train_scraper(ts)


def test_payload_backfill_on_resume(spark, tmp_path):
    """A kill between an epoch's manifest and its payload stages must heal
    on resume: delete one epoch's extractions dir and re-run."""
    import shutil

    plan = _trained_plan()
    root = str(tmp_path / "backfill_crawl")
    cfg = CrawlConfig(budget_per_host=2)
    run_crawl(spark, root, WEB.seeds(2), WEB, cfg, max_epochs=2,
              scraper_plan=plan)
    before = {
        (r.url_canon, r.value_json)
        for r in read_extractions(spark, root).collect()
    }
    shutil.rmtree(f"{root}/snap_00002/extractions")  # simulate the kill
    run_crawl(spark, root, WEB.seeds(2), WEB, cfg, max_epochs=2,
              scraper_plan=plan)
    after = {
        (r.url_canon, r.value_json)
        for r in read_extractions(spark, root).collect()
    }
    assert after == before


def test_trained_plan_applied_over_crawl(spark, tmp_path):
    plan = _trained_plan()
    assert plan["type"] == "dict"

    root = str(tmp_path / "payload_crawl")
    run_crawl(spark, root, WEB.seeds(3), WEB, CrawlConfig(budget_per_host=2),
              max_epochs=3, scraper_plan=plan, emit_images=True)

    fetched = {
        r.url_canon
        for r in read_fetch_log(spark, root).filter("status = 200").collect()
    }
    assert fetched

    # every fetched page's extraction equals the generator's ground truth
    extractions = {
        r.url_canon: json.loads(r.value_json)
        for r in read_extractions(spark, root).collect()
    }
    assert set(extractions) == fetched
    for url, value in extractions.items():
        i, j = parse_page_url(url, WEB)
        assert value == author_for(i, j), url

    # image rows: exact caption equality + attribute-sourced dimensions
    images = {r.image_id: r for r in read_images(spark, root).collect()}
    n_expected = 0
    for url in fetched:
        i, j = parse_page_url(url, WEB)
        if j >= 10_000:
            continue  # private pages carry no gallery links but do have imgs
        for im in captions_for(i, j, WEB):
            n_expected += 1
            got = images[im["src"]]
            assert got.caption == im["caption"]
            assert (got.w, got.h) == (im["w"], im["h"])
