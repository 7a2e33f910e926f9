"""Pure-stdlib PNG codec + the real-decode media tier: exact pixel round
trips across all five scanline filters, error routing, and the media table's
png payloads decoding to their ground-truth pixels."""

import numpy as np
import pytest

from link_profiler_repo_spark.functions.png import decode_png, encode_png


@pytest.mark.parametrize("shape", [(1, 1, 3), (5, 3, 3), (8, 8, 3), (11, 7, 4), (6, 9, 1), (16, 2, 3)])
def test_roundtrip_exact(shape):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == shape
    assert np.array_equal(out, arr)


def test_all_five_filters_exercised_and_gradient():
    # >=5 rows guarantees filters 0..4 all appear (encoder uses r % 5);
    # a smooth gradient exercises the average/paeth predictors' branches
    x = np.linspace(0, 255, 12 * 10 * 3).reshape(12, 10, 3).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(x)), x)


def test_gray_2d_input():
    arr = (np.arange(48, dtype=np.uint8) * 5 % 256).reshape(6, 8)
    out = decode_png(encode_png(arr))
    assert out.shape == (6, 8, 1)
    assert np.array_equal(out[:, :, 0], arr)


def test_non_png_and_truncated_raise():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\xff\xd8\xff\xe0 not a png")
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    # cut past the 12-byte IEND and into the IDAT body itself
    with pytest.raises(ValueError):
        decode_png(good[:-20])


def test_media_png_tier_decodes_real_pixels(spark):
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
    png_rows = [r for r in media.collect() if bytes(r["payload"][:8]) == b"\x89PNG\r\n\x1a\n"]
    assert png_rows, "fixture must produce png-tier rows"
    for r in png_rows[:5]:
        px = decode_png(bytes(r["payload"]))
        assert np.array_equal(px, synth_pixels(r["media_ref"]))
        assert (r["width"], r["height"]) == (8, 8)
    # extract_features: png rows carry REAL normalized pixels
    feats = {f["media_ref"]: f["features"] for f in extract_features(media).collect()}
    r = png_rows[0]
    expect = decode_payload(bytes(r["payload"])).astype(np.float32) / 255.0
    got = np.array(feats[r["media_ref"]], dtype=np.float32)
    assert got.shape == (FEATURE_DIM,)
    assert np.allclose(got, expect)
    truth = synth_pixels(r["media_ref"]).reshape(-1)[:FEATURE_DIM] / 255.0
    assert np.allclose(got, truth.astype(np.float32))


def test_resize_media_real_png_tier(spark):
    from link_profiler_repo_spark.operators.media import (
        media_table_from_docs,
        resize_media,
        synth_pixels,
    )
    from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark

    docs = synth_docs_spark(spark, SynthParams(n_docs=40, n_hosts=4))
    media = media_table_from_docs(docs)
    resized = resize_media(media, 4, 6)
    for r in resized.collect():
        assert (r["width"], r["height"]) == (4, 6)
        p = bytes(r["payload"])
        if p[:8] == b"\x89PNG\r\n\x1a\n":
            px = decode_png(p)
            src = synth_pixels(r["media_ref"])
            rows = (np.arange(6) * src.shape[0]) // 6
            cols = (np.arange(4) * src.shape[1]) // 4
            assert np.array_equal(px, src[rows][:, cols])
            break
    else:
        raise AssertionError("no png rows resized")
