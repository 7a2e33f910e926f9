"""Pure-numpy baseline JPEG codec + the real-decode media tier: exact round
trips where the math is exact (constant blocks, linear gradients at high
quality), bounded error on smooth content, determinism on noise, error
routing, and the media table's jpeg payloads decoding for real."""

import numpy as np
import pytest

from link_profiler_repo_spark.functions.jpeg import decode_jpeg, encode_jpeg


def test_constant_images_roundtrip_exact_at_q100():
    g = np.full((8, 8), 120, np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=100))
    assert out.shape == (8, 8, 1)
    assert np.array_equal(out[:, :, 0], g)
    rgb = np.full((16, 24, 3), [200, 30, 99], np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(rgb, quality=100)), rgb)


def test_smooth_content_tightly_bounded_at_q95():
    grad = (np.add.outer(np.arange(32), np.arange(40)) * 3 % 256).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(grad, quality=95))
    assert np.abs(dg[:, :, 0].astype(int) - grad.astype(int)).max() <= 1
    x = np.linspace(0, np.pi, 40)
    smooth = ((np.sin(np.add.outer(x, x)) * 0.5 + 0.5) * 255).astype(np.uint8)
    ds = decode_jpeg(encode_jpeg(smooth, quality=95))
    assert np.abs(ds[:, :, 0].astype(int) - smooth.astype(int)).max() <= 2


def test_noise_rgb_deterministic_and_reasonable_psnr():
    rng = np.random.RandomState(3)
    n = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)  # non-multiple-of-8 W
    e1, e2 = encode_jpeg(n, 90), encode_jpeg(n, 90)
    assert e1 == e2
    d = decode_jpeg(e1)
    assert d.shape == (24, 17, 3)
    psnr = 10 * np.log10(255**2 / np.mean((d.astype(float) - n.astype(float)) ** 2))
    assert psnr > 25  # noise is JPEG's worst case; baseline q90 lands ~30
    assert np.array_equal(decode_jpeg(e1), d)  # decode is pure


def test_quality_monotone_in_size():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    sizes = [len(encode_jpeg(img, q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_error_routing():
    with pytest.raises(ValueError, match="signature"):
        decode_jpeg(b"GIF89a not a jpeg")
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated mid-segment
    # flip SOF0 -> SOF2 (progressive): explicit unsupported error
    prog = bytearray(good)
    at = prog.find(b"\xff\xc0")
    prog[at + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(prog))


def test_decoder_reads_tables_from_stream_not_constants():
    # corrupt one DQT byte: the decode must change (tables come from the
    # wire), and must not crash
    img = (np.add.outer(np.arange(16), np.arange(16)) * 7 % 256).astype(np.uint8)
    enc = bytearray(encode_jpeg(img, quality=90))
    at = enc.find(b"\xff\xdb") + 5  # first quant entry
    enc[at] = max(1, enc[at] // 2)
    altered = decode_jpeg(bytes(enc))
    assert not np.array_equal(altered, decode_jpeg(encode_jpeg(img, quality=90)))


def test_media_jpeg_tier_decodes_real_pixels(spark):
    from link_profiler_repo_spark.operators.media import (
        FEATURE_DIM,
        decode_payload,
        extract_features,
        media_table_from_docs,
        synth_pixels,
    )
    from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark

    docs = synth_docs_spark(spark, SynthParams(n_docs=40, n_hosts=4))
    media = media_table_from_docs(docs)
    jpeg_rows = [r for r in media.collect() if bytes(r["payload"][:2]) == b"\xff\xd8"]
    assert jpeg_rows, "fixture must produce jpeg-tier rows"
    for r in jpeg_rows[:5]:
        px = decode_jpeg(bytes(r["payload"]))
        truth = synth_pixels(r["media_ref"])
        assert px.shape == truth.shape
        # lossy: same bytes -> same pixels, correlated with the source
        assert np.array_equal(px, decode_jpeg(bytes(r["payload"])))
        err = np.abs(px.astype(int) - truth.astype(int)).mean()
        assert err < 80, f"decode uncorrelated with source (mean err {err})"
    feats = {f["media_ref"]: f["features"] for f in extract_features(media).collect()}
    r = jpeg_rows[0]
    expect = decode_payload(bytes(r["payload"])).astype(np.float32) / 255.0
    got = np.array(feats[r["media_ref"]], dtype=np.float32)
    assert got.shape == (FEATURE_DIM,)
    assert np.allclose(got, expect)


def test_resize_media_real_jpeg_tier(spark):
    from link_profiler_repo_spark.operators.media import (
        media_table_from_docs,
        resize_media,
    )
    from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark

    docs = synth_docs_spark(spark, SynthParams(n_docs=40, n_hosts=4))
    resized = resize_media(media_table_from_docs(docs), 4, 4)
    rows = [r for r in resized.collect() if bytes(r["payload"][:2]) == b"\xff\xd8"]
    assert rows, "fixture must produce jpeg-tier rows"
    for r in rows[:3]:
        px = decode_jpeg(bytes(r["payload"]))
        assert px.shape == (4, 4, 3)
        assert (r["width"], r["height"]) == (4, 4)
