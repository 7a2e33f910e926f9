"""Outreach pipeline analytics — the link-building campaign/event surface.

Reference: `core/models.py:765-856` declares LinkProspect (status lifecycle
"new/contacted/replied/link_acquired/rejected" at :770), OutreachCampaign
with METRIC FIELDS (total_prospects, contacts_made, replies_received,
links_acquired, :814-817) and OutreachEvent (event_type
"email_sent/follow_up/reply/link_secured", :841); the API persists events
(`api/link_building.py:183-219`) and updates prospect status imperatively
per request (`services/link_building_service.py:212-224`) — but nothing in
the reference ever maintains the campaign counters (they stay at their 0
defaults). The relational rendering derives BOTH the prospect lifecycle and
the campaign metrics from the immutable events table, which is the shape
that survives scale: events are append-only facts, status/metrics are
aggregations, and a re-run can never disagree with history.

Plan shapes: prospect status is one groupBy(prospect) with conditional
aggregates (no window — latest-event selection is a max(struct(seq, type))
single-pass agg); campaign metrics are one groupBy(campaign). Both
hash-partition on their key; nothing collects.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

CONTACT_TYPES = ("email_sent", "follow_up")


def prospect_status(
    prospects: DataFrame, events: DataFrame
) -> DataFrame:
    """Prospect lifecycle derived from events → (prospect_id, status,
    last_contacted_seq, link_acquired_seq, n_events).

    status: 'link_acquired' if ANY link_secured event exists (terminal wins
    regardless of later notes), else from the LATEST event (max seq;
    contact types → 'contacted', reply → 'replied'), else 'new' for
    prospects with no events. `prospects` is the dimension (one row per
    prospect_id); `events` carries (prospect_id, event_type, seq) with seq
    any monotone event order (timestamp, sequence number)."""
    lifecycle = F.col("event_type").isin("reply", *CONTACT_TYPES)
    per = events.groupBy("prospect_id").agg(
        F.count("*").alias("n_events"),
        F.max(F.when(F.col("event_type").isin(*CONTACT_TYPES), F.col("seq"))).alias(
            "last_contacted_seq"
        ),
        F.min(F.when(F.col("event_type") == "link_secured", F.col("seq"))).alias(
            "link_acquired_seq"
        ),
        # latest LIFECYCLE event's type without a window: max over (seq,
        # type) structs restricted to lifecycle types — a trailing
        # non-lifecycle event (note_added etc.) must not demote a contacted
        # prospect back to 'new'
        F.max(F.when(lifecycle, F.struct(F.col("seq"), F.col("event_type"))))
        .getField("event_type")
        .alias("_latest_type"),
    )
    status = (
        F.when(F.col("link_acquired_seq").isNotNull(), "link_acquired")
        .when(F.col("_latest_type") == "reply", "replied")
        .when(F.col("_latest_type").isin(*CONTACT_TYPES), "contacted")
        # no events, or no LIFECYCLE events (notes etc. don't advance status)
        .otherwise("new")
    )
    return (
        prospects.join(per, "prospect_id", "left")
        .select(
            "prospect_id",
            status.alias("status"),
            "last_contacted_seq",
            "link_acquired_seq",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


def campaign_metrics(events: DataFrame) -> DataFrame:
    """The OutreachCampaign metric fields (core/models.py:814-817) as one
    aggregation per campaign: total_prospects = distinct prospects touched,
    contacts_made = contact-type events, replies_received = reply events,
    links_acquired = distinct prospects with a link_secured event, plus a
    reply_rate (replies / contacts, 0 when no contacts — the derived KPI the
    reference's mission-control UI would chart)."""
    return events.groupBy("campaign_id").agg(
        F.count_distinct("prospect_id").alias("total_prospects"),
        F.sum(
            F.when(F.col("event_type").isin(*CONTACT_TYPES), 1).otherwise(0)
        ).alias("contacts_made"),
        F.sum(F.when(F.col("event_type") == "reply", 1).otherwise(0)).alias(
            "replies_received"
        ),
        F.count_distinct(
            F.when(F.col("event_type") == "link_secured", F.col("prospect_id"))
        ).alias("links_acquired"),
    ).withColumn(
        "reply_rate",
        F.when(
            F.col("contacts_made") > 0,
            F.round(F.col("replies_received") / F.col("contacts_made"), 6),
        ).otherwise(F.lit(0.0)),
    )
