"""Pure-stdlib WAV (RIFF PCM) codec + the real-decode audio media tier:
sample-exact round trips, chunk-skipping robustness, error routing, and
the media table's audio payloads decoding to their ground-truth waveform."""

import numpy as np
import pytest

from link_profiler_repo_spark.functions.wav import decode_wav, encode_wav, synth_samples


def test_mono_int16_roundtrip_exact():
    s = synth_samples("ref-a", 256)
    d, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and d.shape == (256, 1)
    assert np.array_equal(d[:, 0], s)


def test_multichannel_and_8bit_roundtrip():
    s = synth_samples("ref-b", 100)
    st = np.stack([s, -s], 1)
    d, _ = decode_wav(encode_wav(st, 44100))
    assert np.array_equal(d, st)
    u8 = (np.arange(300) % 256).astype(np.uint8)
    d8, rate = decode_wav(encode_wav(u8, 8000))
    assert rate == 8000 and d8.dtype == np.uint8
    assert np.array_equal(d8[:, 0], u8)


def test_unknown_chunks_skipped_word_aligned():
    s = synth_samples("ref-c", 64)
    enc = bytearray(encode_wav(s))
    at = enc.find(b"data")
    # odd-length LIST chunk + pad byte: the word-alignment path
    enc[at:at] = b"LIST" + (7).to_bytes(4, "little") + b"abcdefg" + b"\x00"
    d, _ = decode_wav(bytes(enc))
    assert np.array_equal(d[:, 0], s)


def test_error_routing():
    with pytest.raises(ValueError, match="signature"):
        decode_wav(b"GIF89a" + b"\x00" * 40)
    with pytest.raises(ValueError, match="signature"):
        decode_wav(b"RIFF\x00\x00\x00\x00AVI " + b"\x00" * 40)
    good = bytearray(encode_wav(synth_samples("d", 32)))
    with pytest.raises(ValueError):
        decode_wav(bytes(good[:-10]))  # truncated data chunk
    nonpcm = bytearray(good)
    nonpcm[20] = 3  # fmt code -> IEEE float
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(bytes(nonpcm))


def test_media_audio_tier_decodes_real_samples(spark):
    from link_profiler_repo_spark.operators.media import (
        FEATURE_DIM,
        decode_payload,
        extract_features,
        media_table_from_docs,
    )
    from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark

    docs = synth_docs_spark(spark, SynthParams(n_docs=40, n_hosts=4))
    media = media_table_from_docs(docs)
    rows = [r for r in media.collect() if bytes(r["payload"][:4]) == b"RIFF"]
    assert rows, "fixture must produce audio-tier rows"
    for r in rows[:5]:
        assert r["media_type"] == "audio"
        assert r["duration_ms"] == 16  # 256 samples at 16 kHz
        d, rate = decode_wav(bytes(r["payload"]))
        assert rate == 16000
        assert np.array_equal(d[:, 0], synth_samples(r["media_ref"], 256))
    feats = {f["media_ref"]: f["features"] for f in extract_features(media).collect()}
    r = rows[0]
    got = np.array(feats[r["media_ref"]], dtype=np.float32)
    expect = decode_payload(bytes(r["payload"])).astype(np.float32) / 255.0
    assert got.shape == (FEATURE_DIM,)
    assert np.allclose(got, expect)
    truth = (synth_samples(r["media_ref"], 256)[:FEATURE_DIM] & 0xFF).astype(np.uint8)
    assert np.allclose(got, truth.astype(np.float32) / 255.0)
