"""Slowly-changing-dimension (type 2) builder over the event stream.

The classic warehouse dimension-versioning operator: collapse each
user's event history into validity intervals of their observed state
(here: the event_type they last emitted), with ``valid_from`` /
``valid_to`` event ids and an ``is_current`` flag — the dimension
table an analyst joins facts against "as of" a point in history. The
reference's interval-sweep views build the same shape for governance
state (src/dao.ts:1231-1352, validity segments between deltas);
this is the generalized SCD-2 form of it.

Exactness: change detection is ``lag`` over the total event order
(event_id), interval close is ``lead`` — all integer ids, no floats,
fully deterministic.

Scale shape: two windows partitioned by user_id (high cardinality —
one shuffle, no skew by construction) and a filter; output is
change-rows only, a fraction of the corpus. At 100 TB this is the
standard one-shuffle window pipeline; both windows share the same
(user_id, event_id) ordering so Spark plans ONE sort and reuses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from .registry import register


@register(
    "scd2_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ),
    changes AS (
      SELECT user_id, event_id AS valid_from, event_type
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           (LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             IS NULL) AS is_current
    FROM changes
    """,
    doc="SCD type-2 dimension build: each user's event_type history "
    "collapsed to validity intervals [valid_from, valid_to) in "
    "event_id order, open-ended current row flagged — the warehouse "
    "dimension-versioning operator (generalizes the reference's "
    "interval-sweep governance segments, src/dao.ts:1231-1352). Lag "
    "for change detection, lead to close intervals; both windows "
    "share one (user_id, event_id) sort so the plan pays a single "
    "user-keyed shuffle, and the output is change-rows only.",
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", F.col("event_id").alias("valid_from"))
    )
    w2 = W.partitionBy("user_id").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
