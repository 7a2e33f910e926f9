"""Pure-stdlib Y4M (YUV4MPEG2) codec + the real-decode video media tier:
sample-exact round trips for mono and 444 planes, header robustness, error
routing, the media table's video payloads decoding to their ground-truth
frames, real frame sampling, and the per-frame nearest-neighbor resize."""

import hashlib

import numpy as np
import pytest

from link_profiler_repo_spark.functions.y4m import (
    VIDEO_FPS,
    VIDEO_T,
    decode_y4m,
    encode_y4m,
    synth_frames,
)


def test_mono_roundtrip_exact():
    f = synth_frames("ref-a", t=4, h=6, w=9)
    d, fps = decode_y4m(encode_y4m(f, 30, 1))
    assert fps == (30, 1) and d.shape == (4, 6, 9)
    assert np.array_equal(d, f)


def test_c444_roundtrip_exact():
    rng = np.random.default_rng(7)
    f = rng.integers(0, 256, size=(3, 5, 8, 3), dtype=np.uint8)
    d, fps = decode_y4m(encode_y4m(f, 24000, 1001))
    assert fps == (24000, 1001) and d.shape == (3, 5, 8, 3)
    assert np.array_equal(d, f)


def test_header_extra_tags_and_single_frame():
    f = synth_frames("ref-b", t=1, h=8, w=8)
    enc = encode_y4m(f, 25, 1)
    # interlace/aspect/X tags between W/H/F and C must be skipped
    assert b" Ip A1:1 " in enc
    with_x = enc.replace(b" Cmono\n", b" Cmono XYSCSS=mono\n", 1)
    d, _ = decode_y4m(with_x)
    assert np.array_equal(d, f)


def test_error_routing():
    with pytest.raises(ValueError, match="signature"):
        decode_y4m(b"RIFF" + b"\x00" * 40)
    with pytest.raises(ValueError, match="signature"):
        decode_y4m(b"YUV4MPEG2")  # no newline / no tags
    good = encode_y4m(synth_frames("ref-c", t=2), VIDEO_FPS, 1)
    with pytest.raises(ValueError, match="truncated frame"):
        decode_y4m(good[:-10])
    with pytest.raises(ValueError, match="unsupported colorspace"):
        decode_y4m(good.replace(b"Cmono", b"C420m", 1))
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(good.replace(b"FRAME\n", b"FRAXE\n", 1))
    with pytest.raises(ValueError, match="no frames"):
        decode_y4m(good[: good.index(b"\n") + 1])
    with pytest.raises(ValueError, match="dtype"):
        encode_y4m(np.zeros((1, 4, 4), dtype=np.int16))
    with pytest.raises(ValueError, match="shape"):
        encode_y4m(np.zeros((4, 4), dtype=np.uint8))


def test_media_video_tier_decodes_real_frames(spark):
    from link_profiler_repo_spark.operators.media import (
        FEATURE_DIM,
        decode_payload,
        extract_features,
        media_table_from_docs,
    )
    from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark

    docs = synth_docs_spark(spark, SynthParams(n_docs=40, n_hosts=4))
    media = media_table_from_docs(docs)
    rows = [r for r in media.collect() if bytes(r["payload"][:9]) == b"YUV4MPEG2"]
    assert rows, "fixture must produce video-tier rows"
    for r in rows[:5]:
        assert r["media_type"] == "video"
        assert r["duration_ms"] == round(VIDEO_T * 1000 / VIDEO_FPS)
        assert (r["width"], r["height"]) == (8, 8)
        frames, fps = decode_y4m(bytes(r["payload"]))
        assert fps == (VIDEO_FPS, 1)
        assert np.array_equal(frames, synth_frames(r["media_ref"]))
    feats = {f["media_ref"]: f["features"] for f in extract_features(media).collect()}
    r = rows[0]
    got = np.array(feats[r["media_ref"]], dtype=np.float32)
    expect = decode_payload(bytes(r["payload"])).astype(np.float32) / 255.0
    assert got.shape == (FEATURE_DIM,)
    assert np.allclose(got, expect)
    truth = synth_frames(r["media_ref"]).reshape(-1)[:FEATURE_DIM]
    assert np.allclose(got, truth.astype(np.float32) / 255.0)


def test_frame_sample_real(spark):
    from link_profiler_repo_spark.operators.media import (
        frame_sample,
        media_table_from_docs,
    )
    from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark

    docs = synth_docs_spark(spark, SynthParams(n_docs=40, n_hosts=4))
    media = media_table_from_docs(docs)
    # 5 frames at 4 fps = 1250 ms; every 500 ms -> ts 0,500,1000 -> idx 0,2,4
    out = frame_sample(media, every_ms=500).collect()
    assert out, "video rows must yield sampled frames"
    by_ref = {}
    for r in out:
        # the media table carries one row per (doc, ref); the same ref's
        # clips are identical, so sampled frames collapse to one set
        by_ref.setdefault(r["media_ref"], set()).add(
            (r["ts_ms"], r["frame_idx"], r["frame_sha256"], r["height"], r["width"])
        )
    for ref, tups in by_ref.items():
        rows = [
            {"ts_ms": t, "frame_idx": i, "frame_sha256": h, "height": hh, "width": ww}
            for (t, i, h, hh, ww) in sorted(tups)
        ]
        assert [r["ts_ms"] for r in rows] == [0, 500, 1000]
        assert [r["frame_idx"] for r in rows] == [0, 2, 4]
        truth = synth_frames(ref)
        for r in rows:
            assert (r["height"], r["width"]) == (8, 8)
            assert r["frame_sha256"] == hashlib.sha256(
                np.ascontiguousarray(truth[r["frame_idx"]]).tobytes()
            ).hexdigest()


def test_resize_video_tier(spark):
    from link_profiler_repo_spark.operators.media import (
        media_table_from_docs,
        resize_media,
    )
    from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark

    docs = synth_docs_spark(spark, SynthParams(n_docs=40, n_hosts=4))
    media = media_table_from_docs(docs)
    small = resize_media(media, 4, 4)
    rows = [r for r in small.collect() if bytes(r["payload"][:9]) == b"YUV4MPEG2"]
    assert rows
    for r in rows[:3]:
        frames, fps = decode_y4m(bytes(r["payload"]))
        assert fps == (VIDEO_FPS, 1)
        assert frames.shape == (VIDEO_T, 4, 4)
        truth = synth_frames(r["media_ref"])
        rows_idx = (np.arange(4) * 8) // 4
        assert np.array_equal(frames, truth[:, rows_idx][:, :, rows_idx])
