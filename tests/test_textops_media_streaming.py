"""Text-analysis, multimodal plumbing, and streaming operator tests."""

import pyspark.sql.functions as F
import pyspark.sql.types as T

from link_profiler_repo_spark.operators.media import (
    FEATURE_DIM,
    extract_features,
    frame_sample_stub,
    media_table_from_docs,
)
from link_profiler_repo_spark.operators.textops import text_profile
from link_profiler_repo_spark.streaming.stream import host_state_batch, run_metrics_stream_once
from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark


def test_text_profile_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox is in the barn"),
            (2, "xyzzy!!! ??? ###"),
            (3, None),
        ],
        schema="doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_profile(df).collect()}
    assert rows[1]["n_tokens"] == 8
    assert rows[1]["lang_pred"] == "en"  # 'the','is','in','the' stopwords
    assert rows[1]["punct_ratio"] == 0.0
    assert rows[2]["lang_pred"] == "unk"
    assert rows[2]["punct_ratio"] > 0.3
    assert rows[1]["quality"] > rows[2]["quality"]
    # fingerprint is whitespace/case-normalized content identity
    df2 = spark.createDataFrame(
        [(1, "THE  quick   Brown fox IS in the barn")], schema="doc_id long, text string"
    )
    fp2 = text_profile(df2).collect()[0]["fingerprint"]
    assert fp2 == rows[1]["fingerprint"]


def test_media_pipeline(spark):
    docs = synth_docs_spark(spark, SynthParams(n_docs=30, n_hosts=3))
    media = media_table_from_docs(docs)
    n_media = media.count()
    assert n_media > 0
    feats = extract_features(media).collect()
    assert len(feats) == n_media
    assert all(len(r["features"]) == FEATURE_DIM for r in feats)
    # deterministic: same ref -> same features
    by_ref = {}
    for r in feats:
        if r["media_ref"] in by_ref:
            assert by_ref[r["media_ref"]] == r["features"]
        by_ref[r["media_ref"]] = r["features"]


def test_frame_sample_shape(spark):
    media = spark.createDataFrame(
        [("v1", "video", 3500), ("i1", "image", None)],
        schema="media_ref string, media_type string, duration_ms int",
    )
    rows = frame_sample_stub(media, every_ms=1000).collect()
    refs = {r["media_ref"] for r in rows}
    assert refs == {"v1"}
    assert {r["frame_idx"] for r in rows} == {0, 1, 2}


def test_metrics_stream(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = spark.createDataFrame(
        [
            ("2024-01-01 00:00:30", "fetch", 1.0),
            ("2024-01-01 00:00:45", "fetch", 3.0),
            ("2024-01-01 00:02:10", "dedup", 2.0),
        ],
        schema="ts string, event_type string, value double",
    ).select(F.to_timestamp("ts").alias("ts"), "event_type", "value")
    path = str(tmp_path / "events")
    src.write.parquet(path)
    rows = run_metrics_stream_once(spark, path, schema, query_name="m_out", window="1 minute", slide="1 minute")
    got = {(str(r["window_start"]), r["event_type"]): r["n"] for r in rows}
    assert got[("2024-01-01 00:00:00", "fetch")] == 2
    assert got[("2024-01-01 00:02:00", "dedup")] == 1


def test_host_state_circuit_breaker(spark):
    log = spark.createDataFrame(
        [("h1", s) for s in [500, 500, 500, 500, 500, 200]]
        + [("h2", s) for s in [200, 200, 404]],
        schema="host string, status_code int",
    )
    states = {r["host"]: (r["failures"], r["cb_state"]) for r in host_state_batch(log).collect()}
    assert states["h1"] == (5, "open")
    assert states["h2"] == (1, "closed")


def test_host_state_stream_matches_batch(spark, tmp_path):
    """Streaming circuit breaker (applyInPandasWithState): final per-host
    failure counts and open/closed states equal the batch rendering over the
    same fetch log."""
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from link_profiler_repo_spark.streaming.stream import (
        host_state_batch,
        host_state_stream,
    )

    log = spark.range(200).select(
        F.concat(F.lit("h"), (F.col("id") % 5).cast("string")).alias("host"),
        # hosts h3/h4 fail often enough to trip the breaker
        F.when(F.col("id") % 5 >= 3, 503).otherwise(200).alias("status_code"),
    )
    src = str(tmp_path / "fetchlog")
    log.coalesce(2).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("status_code", T.IntegerType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        host_state_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hs_out")
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql(
        "SELECT host, failures, cb_state FROM hs_out"
    ).collect()
    q.stop()
    # update mode may emit a row per micro-batch; counts only grow, so the
    # final state per host is the max-failures row
    last = {}
    for r in rows:
        cur = (int(r["failures"]), r["cb_state"])
        if r["host"] not in last or cur[0] > last[r["host"]][0]:
            last[r["host"]] = cur
    expected = {
        r["host"]: (int(r["failures"]), r["cb_state"])
        for r in host_state_batch(log).collect()
    }
    assert last == expected
    assert expected["h3"][1] == "open" and expected["h0"][1] == "closed"


def test_flesch_matches_reference_transcription(spark):
    """Exact Flesch reading ease (content_validator.py:103-150): the Catalyst
    expression must equal a direct Python transcription of the reference
    algorithm on clamped AND mid-range inputs."""
    import re

    def ref_flesch(content):
        sentences = len(re.findall(r"[.!?]+", content))
        words = len(content.split())
        total = 0
        for word in content.lower().split():
            word = re.sub(r"[^a-z]", "", word)
            if not word:
                continue
            vowels = "aeiouy"
            syl = 0
            prev = False
            for ch in word:
                isv = ch in vowels
                if isv and not prev:
                    syl += 1
                prev = isv
            if word.endswith("e") and syl > 1:
                syl -= 1
            total += max(1, syl)
        if sentences == 0 or words == 0:
            return 0.0
        return max(0.0, min(100.0, 206.835 - 1.015 * (words / sentences) - 84.6 * (total / words)))

    texts = [
        "The quick brown fox jumps over the lazy dog. It was easy to read!",
        "no sentence markers at all",
        "",
        "One. Two! Three? 123 456 e e e",
        "Cats sleep. Dogs bark loudly. Understanding animal behavior requires "
        "observation and patience over considerable time periods.",
        "Performance matters. Simple code wins. People like short words. "
        "It is good. Yes it is!",
    ]
    from link_profiler_repo_spark.operators.textops import flesch_reading_ease

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: r["f"]
        for r in df.select("i", flesch_reading_ease(F.col("text")).alias("f")).collect()
    }
    for i, t in enumerate(texts):
        assert abs(got[i] - ref_flesch(t)) < 1e-9, (i, got[i], ref_flesch(t))
    assert any(0.0 < got[i] < 100.0 for i in got), "need a mid-range case"


def test_metrics_stream_foreachbatch_parquet_matches_memory(spark, tmp_path):
    """The update-mode foreachBatch parquet sink (the scale-shaped streaming
    path) converges to the same final window state as the complete-mode
    memory-sink harness over the same files."""
    from link_profiler_repo_spark.streaming.stream import (
        run_metrics_stream_to_parquet,
    )

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = spark.createDataFrame(
        [
            ("2024-01-01 00:00:30", "fetch", 1.0),
            ("2024-01-01 00:00:45", "fetch", 3.0),
            ("2024-01-01 00:02:10", "dedup", 2.0),
        ],
        schema="ts string, event_type string, value double",
    ).select(F.to_timestamp("ts").alias("ts"), "event_type", "value")
    path = str(tmp_path / "events")
    src.write.parquet(path)

    mem = run_metrics_stream_once(
        spark, path, schema, query_name="m_out2", window="1 minute", slide="1 minute"
    )
    pq = run_metrics_stream_to_parquet(
        spark, path, schema,
        out_path=str(tmp_path / "sink"), checkpoint=str(tmp_path / "ckpt"),
        window="1 minute", slide="1 minute",
    ).collect()
    as_set = lambda rows: {  # noqa: E731
        (str(r["window_start"]), r["event_type"], r["n"], r["mean_value"])
        for r in rows
    }
    assert as_set(pq) == as_set(mem) and len(pq) > 0


def test_dedup_stream_matches_batch(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark) keeps exactly
    one row per content key across micro-batches — the same survivor SET as
    batch dropDuplicates over the full log (first-arrival within a batch is
    engine-order-dependent, so equality is on the key set + counts)."""
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from link_profiler_repo_spark.streaming.stream import run_dedup_stream_to_parquet

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("content_hash", T.StringType()),
            T.StructField("url", T.StringType()),
        ]
    )
    rows = [
        ("2024-01-01 00:00:01", "h1", "u1"),
        ("2024-01-01 00:00:02", "h2", "u2"),
        ("2024-01-01 00:00:03", "h1", "u1-dup"),
        ("2024-01-01 00:00:04", "h3", "u3"),
        ("2024-01-01 00:00:05", "h2", "u2-dup"),
        ("2024-01-01 00:00:06", "h1", "u1-dup2"),
    ]
    src = spark.createDataFrame(rows, "ts string, content_hash string, url string").select(
        F.to_timestamp("ts").alias("ts"), "content_hash", "url"
    )
    in_path = str(tmp_path / "in")
    src.write.parquet(in_path)
    got = run_dedup_stream_to_parquet(
        spark, in_path, schema,
        out_path=str(tmp_path / "out"), checkpoint=str(tmp_path / "ck"),
    )
    kept = got.collect()
    assert sorted(r["content_hash"] for r in kept) == ["h1", "h2", "h3"]
    batch_keys = {r["content_hash"] for r in src.dropDuplicates(["content_hash"]).collect()}
    assert {r["content_hash"] for r in kept} == batch_keys
