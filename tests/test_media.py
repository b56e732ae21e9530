"""Audio/video multimodal plumbing: schemas, Arrow batch shapes, codec
round-trips, frame sampling, and the one-bad-blob-never-fails-a-task
policy (mirrors test_images.py for the media module)."""
import numpy as np
import pytest

from mlscraper_spark.media.ops import (
    AUDIO_SCHEMA,
    FRAMES_SCHEMA,
    VIDEO_SCHEMA,
    audio_features,
    decode_audio,
    decode_video,
    encode_audio,
    encode_video,
    sample_frames,
    synth_audio,
    synth_audio_table,
    synth_video,
    synth_video_table,
)


def test_pcm16_roundtrip_bit_exact():
    s = synth_audio("audio/42", 4000)
    assert np.array_equal(decode_audio(encode_audio(s, "pcm16"), "pcm16"), s)


def test_rawv_roundtrip_bit_exact():
    v = synth_video("video/7", 16, 16, 5)
    assert np.array_equal(decode_video(encode_video(v, "rawv"), "rawv", 16, 16), v)


def test_compressed_codecs_stub_loudly():
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00", "mp3")
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00", "mp4", 16, 16)
    with pytest.raises(NotImplementedError):
        encode_audio(synth_audio("a", 10), "opus")


def test_audio_table_and_features(spark):
    ids = spark.range(20).selectExpr("cast(id as string) as doc_id")
    audio = synth_audio_table(ids)
    assert audio.schema == AUDIO_SCHEMA
    feats = audio_features(audio).collect()
    assert len(feats) == 20
    assert all(r.decode_ok for r in feats)
    # duration = n_samples / sample_rate exactly, rms positive
    by_id = {r.audio_id: r for r in audio.select("audio_id", "n_samples").collect()}
    for r in feats:
        assert r.duration_s == round(by_id[r.audio_id].n_samples / 8000, 4)
        assert r.rms > 0
    # determinism: same ids → same features
    again = sorted(map(tuple, audio_features(synth_audio_table(ids)).collect()))
    assert again == sorted(map(tuple, feats))


def test_video_table_and_frame_sampling(spark):
    ids = spark.range(10).selectExpr("cast(id as string) as doc_id")
    video = synth_video_table(ids)
    assert video.schema == VIDEO_SCHEMA
    frames = sample_frames(video, every_k=2)
    assert frames.schema == FRAMES_SCHEMA
    rows = frames.collect()
    nf = {r.video_id: r.n_frames for r in video.select("video_id", "n_frames").collect()}
    got = {}
    for r in rows:
        assert r.decode_ok
        got[r.video_id] = got.get(r.video_id, 0) + 1
    # every-2nd sampling: ceil(n_frames / 2) frames per clip
    assert got == {vid: (n + 1) // 2 for vid, n in nf.items()}
    # sampled frames are the synth frames, re-encoded lossless
    from mlscraper_spark.images.codec import decode_ppm, make_image

    r0 = min(rows, key=lambda r: (r.video_id, r.frame_idx))
    assert np.array_equal(
        decode_ppm(bytes(r0.frame_png)),
        make_image(f"{r0.video_id}#{r0.frame_idx}", 16, 16),
    )


def test_bad_blob_yields_row_not_task_failure(spark):
    import pandas as pd

    audio = spark.createDataFrame(
        pd.DataFrame(
            {
                "audio_id": ["audio/ok", "audio/compressed", "audio/null",
                             "audio/truncated", "audio/sr0"],
                "bytes": [bytes(encode_audio(synth_audio("audio/ok", 800), "pcm16")),
                          b"\xff\xfb\x90", None, b"\x01\x02\x03",
                          bytes(encode_audio(synth_audio("audio/sr0", 80), "pcm16"))],
                "sample_rate": [8000, 8000, 8000, 8000, 0],
                "n_samples": [800, 0, 0, 0, 80],
                "fmt": ["pcm16", "mp3", "pcm16", "pcm16", "pcm16"],
                "transcript": ["t"] * 5,
            }
        ),
        AUDIO_SCHEMA,
    )
    feats = {r.audio_id: r for r in audio_features(audio).collect()}
    assert feats["audio/ok"].decode_ok
    # stubbed fmt, null blob, odd-length pcm16, zero sample rate — every
    # failure mode downgrades to a row, never a task failure
    for bad in ("audio/compressed", "audio/null", "audio/truncated", "audio/sr0"):
        assert not feats[bad].decode_ok, bad
        assert feats[bad].rms is None, bad

    video = spark.createDataFrame(
        pd.DataFrame(
            {
                "video_id": ["video/mp4", "video/null", "video/badlen"],
                "bytes": [b"\x00\x00\x00\x18ftyp", None, b"\x01\x02\x03\x04"],
                "w": [16] * 3, "h": [16] * 3, "n_frames": [3] * 3,
                "fps": [8] * 3,
                "fmt": ["mp4", "rawv", "rawv"],
            }
        ),
        VIDEO_SCHEMA,
    )
    rows = sample_frames(video).collect()
    assert len(rows) == 3 and not any(r.decode_ok for r in rows)


# ---------------------------------------------------------------------------
# G.711 µ-law: the REAL compressed audio format (q43)
# ---------------------------------------------------------------------------


def test_ulaw_bit_exact_vs_audioop():
    """Every int16 value encodes and every code byte decodes EXACTLY as
    CPython's audioop (the reference G.711 tables).  audioop is gone in
    3.13 — skip there; the closed-form properties below still pin the
    codec."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        audioop = pytest.importorskip("audioop")
    from mlscraper_spark.media.ops import ulaw_decode, ulaw_encode

    xs = np.arange(-32768, 32768, dtype=np.int16)
    assert ulaw_encode(xs) == audioop.lin2ulaw(xs.tobytes(), 2)
    codes = np.arange(256, dtype=np.uint8).tobytes()
    assert np.array_equal(
        ulaw_decode(codes),
        np.frombuffer(audioop.ulaw2lin(codes, 2), dtype=np.int16),
    )


def test_ulaw_closed_form_properties():
    """audioop-independent invariants: 1 byte/sample, re-encoding a decoded
    code is the identity (except negative zero 0x7F, which canonicalizes to
    positive zero 0xFF), decode is odd-symmetric-ish and monotone within
    each sign, and the round-trip error respects the segment step bound."""
    from mlscraper_spark.media.ops import ulaw_decode, ulaw_encode

    xs = np.arange(-32768, 32768, dtype=np.int16)
    blob = ulaw_encode(xs)
    assert len(blob) == len(xs)  # exactly 1 byte/sample (the 2× format)
    codes = np.arange(256, dtype=np.uint8)
    dec = ulaw_decode(codes.tobytes())
    re = np.frombuffer(ulaw_encode(dec), dtype=np.uint8)
    mism = codes[re != codes]
    assert mism.tolist() == [0x7F]  # ±0 canonicalization only
    # segment step bound: |decode(encode(x)) - x| < 2^(seg+3) in the
    # 16-bit domain, and never above the top-segment step
    rt = ulaw_decode(blob).astype(np.int64)
    err = np.abs(rt - xs.astype(np.int64))
    assert int(err.max()) <= 1024
    # low amplitudes quantize finely (log companding's whole point)
    # (int32 first: np.abs(int16 -32768) overflows back to -32768)
    small = np.abs(xs.astype(np.int32)) <= 1000
    assert int(err[small].max()) <= 64


def test_ulaw_through_audio_table_and_inventory(spark):
    """fmt='ulaw' rows carry REAL µ-law payloads: the inventory decodes
    them (decode_ok=true), the decoded sample count equals the metadata
    count, and the blob is exactly n_samples bytes — half of pcm16's."""
    from mlscraper_spark.media.ops import audio_inventory

    ids = spark.createDataFrame(
        [(1, 3000, "ulaw"), (2, 3000, "pcm16"), (3, 3000, "mp3")],
        "doc_id int, n_samples int, fmt string",
    )
    rows = {r.media_id: r for r in audio_inventory(
        synth_audio_table(ids)).collect()}
    u, p, m = rows["audio/1"], rows["audio/2"], rows["audio/3"]
    assert u.decode_ok and u.n_units == 3000 and u.n_bytes == 3000
    assert p.decode_ok and p.n_units == 3000 and p.n_bytes == 6000
    assert (not m.decode_ok) and m.n_units == 0 and m.n_bytes == 6000


def test_ulaw_snr_floor():
    """SNR of the µ-law round-trip over the synthetic waveforms stays
    above q43's 30 dB oracle floor (amplitudes 1000..21000 sit well above
    the first segment, where log companding holds SNR ~flat)."""
    from mlscraper_spark.media.ops import ulaw_decode, ulaw_encode

    worst = 1e9
    for i in range(25):
        s = synth_audio(f"audio/{i}", 4000)
        dec = ulaw_decode(ulaw_encode(s)).astype(np.float64)
        orig = s.astype(np.float64)
        snr = 10.0 * np.log10(np.mean(orig ** 2) / np.mean((dec - orig) ** 2))
        worst = min(worst, snr)
    assert worst >= 30.0, f"worst SNR {worst:.1f} dB"
