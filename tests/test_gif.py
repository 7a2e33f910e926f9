"""Pure-stdlib GIF codec + the real-decode media tier: exact pixel round
trips across LZW code-width growth and the 4096-entry table reset, error
routing, and the media table's gif payloads decoding to their ground-truth
pixels."""

import numpy as np
import pytest

from link_profiler_repo_spark.functions.gif import decode_gif, encode_gif


@pytest.mark.parametrize("shape", [(1, 1), (8, 8), (5, 13), (16, 2)])
def test_gray_roundtrip_exact(shape):
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_gif(encode_gif(arr))
    assert out.shape == shape + (3,)
    for c in range(3):  # identity gray palette: all channels equal the input
        assert np.array_equal(out[:, :, c], arr)


def test_rgb_roundtrip_exact_and_palette_bound():
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)  # <=64 colors
    assert np.array_equal(decode_gif(encode_gif(arr)), arr)
    two = np.zeros((16, 16, 3), np.uint8)
    two[::2] = [255, 10, 3]
    assert np.array_equal(decode_gif(encode_gif(two)), two)
    i = np.arange(1600)
    many = np.stack([i // 256, i % 256, np.zeros_like(i)], 1).astype(np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(many.reshape(40, 40, 3))


def test_lzw_table_reset_and_code_growth():
    # 90x90 noise exceeds 4096 dictionary entries -> encoder emits CLEAR and
    # rebuilds mid-stream; the gradient drives long match chains through
    # every code width up to the reset
    rng = np.random.default_rng(17)
    noise = rng.integers(0, 256, size=(90, 90), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(noise))[:, :, 0], noise)
    grad = (np.add.outer(np.arange(64), np.arange(96)) % 256).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(grad))[:, :, 2], grad)


def test_non_gif_truncated_and_unsupported_raise():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"\x89PNG\r\n\x1a\x0a not a gif")
    good = bytearray(encode_gif(np.zeros((6, 6), np.uint8)))
    with pytest.raises(ValueError):
        decode_gif(bytes(good[:-30]))  # cut into the LZW sub-blocks
    interlaced = bytearray(good)
    # image descriptor starts after 13-byte LSD + 768-byte gray GCT
    assert interlaced[13 + 768] == 0x2C
    interlaced[13 + 768 + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(interlaced))


def test_media_gif_tier_decodes_real_pixels(spark):
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
    gif_rows = [r for r in media.collect() if bytes(r["payload"][:4]) == b"GIF8"]
    assert gif_rows, "fixture must produce gif-tier rows"
    for r in gif_rows[:5]:
        px = decode_gif(bytes(r["payload"]))
        assert np.array_equal(px, synth_pixels(r["media_ref"]))
        assert (r["width"], r["height"]) == (8, 8)
    feats = {f["media_ref"]: f["features"] for f in extract_features(media).collect()}
    r = gif_rows[0]
    expect = decode_payload(bytes(r["payload"])).astype(np.float32) / 255.0
    got = np.array(feats[r["media_ref"]], dtype=np.float32)
    assert got.shape == (FEATURE_DIM,)
    assert np.allclose(got, expect)
    truth = synth_pixels(r["media_ref"]).reshape(-1)[:FEATURE_DIM] / 255.0
    assert np.allclose(got, truth.astype(np.float32))


def test_resize_media_real_gif_tier(spark):
    from link_profiler_repo_spark.operators.media import (
        media_table_from_docs,
        resize_media,
        synth_pixels,
    )
    from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark

    docs = synth_docs_spark(spark, SynthParams(n_docs=40, n_hosts=4))
    resized = resize_media(media_table_from_docs(docs), 4, 4)
    rows = [r for r in resized.collect() if bytes(r["payload"][:4]) == b"GIF8"]
    assert rows, "fixture must produce gif-tier rows"
    for r in rows[:3]:
        px = decode_gif(bytes(r["payload"]))
        src = synth_pixels(r["media_ref"])
        sel = (np.arange(4) * src.shape[0]) // 4
        assert np.array_equal(px, src[sel][:, sel])
        assert (r["width"], r["height"]) == (4, 4)
