"""The bench harness is driver contract: the pieces that run at module scope
or render committed artifacts must never break silently."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_size_sweep_renderer_matches_committed_artifact():
    """BASELINE.md's size-linearity section is rendered from
    BENCH/SIZE_SWEEP.jsonl on every full bench run — the renderer must parse
    the committed artifact and produce the table."""
    import bench

    md = bench._size_sweep_md()
    assert "## Frontier-SIZE linearity" in md
    assert "| layout |" in md
    # one row per recorded layout
    assert md.count("\n| buckets") == 2
    assert "µs/URL" in md


def test_size_sweep_artifact_shape():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "SIZE_SWEEP.jsonl",
    )
    for line in open(path):
        e = json.loads(line)
        assert {"cores", "rounds", "scale_buckets", "buckets", "sizes", "linearity"} <= set(e)
        assert len(e["sizes"]) == len(e["linearity"]) == len(e["buckets"])
        for r in e["sizes"]:
            assert r["urls"] > 0 and r["urls_per_sec"] > 0
