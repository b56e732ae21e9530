"""Image payload invariants per BASELINE.json input_hint: lossless
bit-exactness, lossy PSNR ≥ 40 dB, exact caption equality through the full
crawl→extract pipeline, phash stability."""
import numpy as np
import pytest

from mlscraper_spark.images.codec import (
    decode,
    decode_dctq,
    decode_ppm,
    encode,
    encode_dctq,
    encode_ppm,
    hamming64,
    make_image,
    phash,
    psnr,
)


def test_ppm_roundtrip_bit_exact():
    img = make_image("img-1-2-3", 64, 48)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


@pytest.mark.parametrize("w,h", [(64, 48), (33, 17), (8, 8), (100, 100)])
def test_dctq_psnr_at_least_40db(w, h):
    img = make_image(f"img-{w}-{h}", w, h)
    out = decode_dctq(encode_dctq(img))
    assert out.shape == img.shape
    assert psnr(img, out) >= 40.0


def test_make_image_deterministic():
    a = make_image("img-0-0-0", 32, 32)
    b = make_image("img-0-0-0", 32, 32)
    c = make_image("img-0-0-1", 32, 32)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_phash_properties():
    # deterministic; lossy re-encode stays near; distinct images stay far
    import statistics

    ids = [f"img-{a}-{b}-0" for a in range(4) for b in range(2)]
    hashes = {}
    for iid in ids:
        img = make_image(iid, 64, 64)
        assert phash(img) == phash(img.copy())
        hashes[iid] = phash(img)
        rt = decode_dctq(encode_dctq(img))
        assert hamming64(phash(img), phash(rt)) <= 16
    cross = [
        hamming64(hashes[a], hashes[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
    ]
    assert statistics.median(cross) >= 24


def test_unknown_format_is_stubbed():
    with pytest.raises(NotImplementedError):
        encode(make_image("x", 8, 8), "jpeg")
    with pytest.raises(NotImplementedError):
        decode(b"\xff\xd8", "jpeg")


def test_images_table_from_crawled_pages(spark):
    """Full pipeline: synthetic fetch → images table → invariants."""
    from mlscraper_spark.crawl.synthweb import WebConfig, captions_for, fetch
    from mlscraper_spark.images.ops import extract_images_table, image_features

    web = WebConfig(n_hosts=4, max_pages_per_host=6)
    pages = []
    for i in range(2):
        for j in range(2):
            status, html = fetch(f"http://host{i}.test/page/{j}", web)
            pages.append((f"http://host{i}.test/page/{j}", bytearray(html)))
    pages_df = spark.createDataFrame(pages, "url_canon string, html binary")
    images = extract_images_table(pages_df)
    rows = {r.image_id: r for r in images.collect()}
    assert len(rows) == 4 * web.images_per_page

    # exact caption equality + w/h from attributes (the input_hint invariant)
    for i in range(2):
        for j in range(2):
            for im in captions_for(i, j, web):
                got = rows[im["src"]]
                assert got.caption == im["caption"]
                assert (got.w, got.h) == (im["w"], im["h"])
                assert got.fmt in ("ppm", "dctq")
                # decoded-pixel invariant
                img = decode(bytes(got.bytes), got.fmt)
                ref = make_image(im["src"], im["w"], im["h"])
                if got.fmt == "ppm":
                    assert np.array_equal(img, ref)
                else:
                    assert psnr(ref, img) >= 40.0
                assert got.phash == phash(img)

    feats = {r.image_id: r for r in image_features(images).collect()}
    assert all(f.decode_ok for f in feats.values())
    for iid, r in rows.items():
        assert feats[iid].phash_check == r.phash


def test_malformed_dimension_attrs_do_not_fail_extraction():
    """Real-web width/height attrs carry '100%', '', 'auto' — one
    malformed page must yield w/h=0, never a ValueError inside the Arrow
    UDF (ADVICE round 1)."""
    from mlscraper_spark.crawl.synthweb import extract_images

    html = (
        b'<html><body>'
        b'<img src="a.png" alt="pct" width="100%" height="">'
        b'<img src="b.png" alt="auto" width="auto">'
        b'<img src="c.png" alt="ok" width="32" height="16">'
        b"</body></html>"
    )
    rows = extract_images(html)
    assert [(r["w"], r["h"]) for r in rows] == [(0, 0), (0, 0), (32, 16)]
    assert [r["caption"] for r in rows] == ["pct", "auto", "ok"]
