"""Report export (SURVEY S11) — the reference's ReportService content as a
DataFrame plan, with presentation-layer rendering at the driver.

Reference: `services/report_service.py:79-215` (PDF) and `:215-313` (Excel)
assemble, per target URL: a summary table (total backlinks, unique referring
domains, dofollow/nofollow counts, scores, analysis date), the top-10 anchor
texts by count, the top-10 referring domains, and a 10-row backlink sample
(source_url, anchor_text, type) — then lay the same data out with
ReportLab/openpyxl.

Split the same way Spark splits compute from presentation: the report DATA
is one nested row per target, assembled distributed from the existing
profile operators (A1/A2 rollups — nothing here re-aggregates); rendering is
a driver-side serialization of that row. JSON export stays fully distributed
(S12 machinery); HTML renders via pandas (stdlib-available); the PDF/Excel
layouts need reportlab/openpyxl, which this sandbox does not ship, so those
two formats raise NotImplementedError at the final render step with the
assembly still real and tested (same policy as media decode, media.py:58-66).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def link_profile_report(edges: DataFrame, k: int = 10, sample_k: int = 10) -> DataFrame:
    """One report row per target URL: summary struct + top-k anchor/domain
    maps + a deterministic backlink sample (report_service.py:115-200
    sections). The sample is the k lexicographically-first (src, anchor)
    backlinks — the reference shows backlinks[:10] in arbitrary DB order;
    a pinned order keeps the report reproducible run-to-run. Bounded
    collect_list+slice per key: no global sort, no unbounded state."""
    from .profile import full_link_profile

    prof = full_link_profile(edges, k=k)
    sample = (
        edges.groupBy(F.col("dst").alias("target_url"))
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("src").alias("source_url"),
                            F.col("anchor_text"),
                            F.col("link_type"),
                        )
                    )
                ),
                1,
                sample_k,
            ).alias("sample_backlinks")
        )
    )
    return prof.join(sample, "target_url", "left").select(
        "target_url",
        F.struct(
            "total_backlinks",
            "unique_referring_domains",
            "dofollow_backlinks",
            "nofollow_backlinks",
            "sponsored_backlinks",
            "ugc_backlinks",
        ).alias("summary"),
        F.col("top_anchor_text").alias("top_anchors"),
        F.col("top_src_host").alias("top_referring_domains"),
        "sample_backlinks",
    )


def export_report(report: DataFrame, path: str, fmt: str = "json", max_rows: int = 10_000):
    """Serialize report rows. 'json' is distributed (one shard per partition,
    the S12 sink pattern). 'html' renders at the driver via pandas — reports
    are per-target rows, so the driver transfer is bounded by max_rows (a
    guard, not a scale path; export JSON for bulk). 'xlsx' renders via
    pandas.to_excel when openpyxl is available and raises NotImplementedError
    otherwise (it is absent in this sandbox). 'pdf' assembles the identical
    frame then always raises: the ReportLab layout (report_service.py:96-213)
    is presentation work out of scope here."""
    if fmt == "json":
        report.write.mode("overwrite").json(path)
        return path
    if fmt not in ("html", "xlsx", "pdf"):
        raise ValueError(f"unknown report format: {fmt}")
    pdf = report.limit(max_rows).toPandas()
    for c in ("top_anchors", "top_referring_domains", "sample_backlinks"):
        if c in pdf.columns:
            pdf[c] = pdf[c].map(lambda v: str(v) if v is not None else "")
    if fmt == "html":
        pdf.to_html(path, index=False)
        return path
    if fmt == "xlsx":
        try:
            import openpyxl  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "xlsx rendering needs openpyxl (not shipped in this sandbox); "
                "the report frame is assembled — export 'json' or 'html'"
            ) from e
        pdf.to_excel(path, index=False)
        return path
    try:
        import reportlab  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "pdf rendering needs reportlab (not shipped in this sandbox); "
            "the report frame is assembled — export 'json' or 'html'"
        ) from e
    raise NotImplementedError("pdf layout not implemented")
