"""Corpus-profiling queries built on the Misra-Gries heavy-hitters
kernel.

``heavy_hitters_mg`` is the BATCH twin of the streaming operator in
`streaming/heavy_hitters.py` — same weighted MG kernel
(``mg_update_weighted`` over per-batch ``value_counts()`` pairs),
driven here as the canonical two-stage batch pipeline:

1. **Candidate generation, map-only**: each input partition runs its
   own MG(k) summary via ``mapInPandas`` (O(k) state per partition,
   zero shuffle). Completeness proof: if an item is absent from
   partition p's summary, its count there is <= n_p/(k+1) (the MG
   bound); absent from EVERY summary would mean a global count
   <= sum_p n_p/(k+1) = n/(k+1). Contrapositive: every item with
   global count > n/(k+1) appears in at least one partition summary.
2. **Exact recount of the candidate union**: candidates (<= k per
   partition) are broadcast back over the input for a semi join, the
   matched rows get an ordinary map-side-combined groupBy count, and
   the global threshold ``cnt*(k+1) > n`` filters the survivors.

Because stage 2 re-counts exactly and the stage-1 guarantee makes the
candidate set a superset of every above-threshold item, the final
result is ORDER-INVARIANT — independent of partitioning, arrival
order, and which near-threshold items happen to survive eviction. That
is what makes a sketch-backed query value-hash-checkable against a
plain ``GROUP BY ... HAVING cnt*(k+1) > n`` DuckDB oracle: a broken
kernel (a missed heavy item) shows up as a missing output row.

At 100 TB the shape is: one scan + O(k x partitions) candidate rows
broadcast + one partial-aggregated shuffle of only candidate-matched
groups — no per-key state, no global sort, no second full shuffle.

The item here is ``event_type || '/' || decade-bucket(value)`` — 15
distinct items with shares from ~14% down to ~2.5% at every SF, so
with k=9 the counters genuinely evict (15 > 9) and the >10%-share
output is non-empty at every scale. Buckets use exact comparisons
(``value >= 100``, ``>= 10``), not ``floor(log10(..))``, so no float
boundary can disagree across engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.sketches import hash_sample_pred, hash_sample_pred_sql
from ..streaming.heavy_hitters import mg_update_weighted
from .registry import register

# 15 distinct items vs 9 counters: eviction is exercised at every SF,
# and the n/(k+1) = 10% share threshold keeps the output non-empty.
MG_K = 9


def _items(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") >= 100, F.lit(2))
        .when(F.col("value") >= 10, F.lit(1))
        .otherwise(F.lit(0))
    )
    return ev.filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    ).select(
        F.concat_ws("/", F.col("event_type"), bucket.cast("string")).alias("item")
    )


@register(
    "heavy_hitters_mg",
    oracle="""
    WITH items AS (
      SELECT event_type || '/' ||
             CAST(CASE WHEN value >= 100 THEN 2
                       WHEN value >= 10 THEN 1
                       ELSE 0 END AS VARCHAR) AS item
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
    ), tot AS (SELECT COUNT(*) AS n FROM items)
    SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM items, tot
    GROUP BY item, tot.n
    HAVING COUNT(*) * 10 > tot.n
    """,
    doc="Batch heavy hitters over event-type/value-decade items via "
    "per-partition Misra-Gries summaries (mapInPandas, O(k) state, "
    "map-only) + exact broadcast-semi-join recount of the candidate "
    "union, thresholded at count*(k+1) > n. The MG completeness "
    "bound makes the result order-invariant and exactly equal to the "
    "plain GROUP BY/HAVING oracle — the driver-checkable twin of "
    "streaming/heavy_hitters.py (same mg_update_weighted kernel over "
    "per-batch value_counts() pairs).",
)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = _items(spark, sf_dir)
    k = MG_K

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            if len(pdf):
                # value_counts() collapses the Arrow batch to (distinct
                # item, count) pairs first, so the Python MG loop runs
                # per distinct item rather than per row.
                vc = pdf["item"].value_counts()
                mg_update_weighted(counters, vc.index.tolist(), vc.to_numpy(), k)
        if counters:
            yield pd.DataFrame({"item": sorted(counters)})

    candidates = items.mapInPandas(summarize, "item string").distinct()
    counts = (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = items.agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (k + 1) > F.col("n"))
        .select("item", "cnt")
    )


# ---------------------------------------------------------------------------
# Sampled quantiles: the portable quantile-sketch path
# ---------------------------------------------------------------------------

QUANT_RATIO_BITS = 3  # 1-in-8 rows


@register(
    "approx_quantiles_sampled",
    oracle=f"""
    WITH s AS (
      SELECT event_type, value FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND {hash_sample_pred_sql("CAST(event_id AS VARCHAR)", QUANT_RATIO_BITS)}
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_sample,
           ROUND(quantile_cont(value, 0.25), 4) AS q25,
           ROUND(quantile_cont(value, 0.50), 4) AS q50,
           ROUND(quantile_cont(value, 0.75), 4) AS q75
    FROM s GROUP BY event_type
    """,
    doc="Per-type value quartiles over a deterministic 1-in-8 hash "
    "sample of rows (operators/sketches.py hash_sample_pred): the "
    "portable quantile-sketch path. An exact percentile shuffles and "
    "sorts EVERY row of the group; here the map-side hash predicate "
    "drops 7/8 of the rows before any shuffle, and because the "
    "sample is keyed on md5(event_id) both engines retain exactly "
    "the same rows — so even the approximate answer value-hashes "
    "(Spark's approx_percentile/t-digest cannot: its sketch is not "
    "reproducible cross-engine). Spark percentile() and DuckDB "
    "quantile_cont() share the (n-1)*p linear-interpolation "
    "definition; results round to 4dp inside the plan on both sides.",
)
def approx_quantiles_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s = ev.filter(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & hash_sample_pred(F.col("event_id").cast("string"), QUANT_RATIO_BITS)
    )
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.round(F.expr("percentile(value, 0.25)"), 4).alias("q25"),
        F.round(F.expr("percentile(value, 0.50)"), 4).alias("q50"),
        F.round(F.expr("percentile(value, 0.75)"), 4).alias("q75"),
    )


# ---------------------------------------------------------------------------
# Count-Min point-count estimates: the sketch family's fourth member
# ---------------------------------------------------------------------------

CM_DEPTH = 3
CM_WIDTH = 64


def _cm_oracle() -> str:
    from ..operators.sketches import cm_bucket_sql

    cell_ctes = []
    probe_ctes = []
    for i in range(CM_DEPTH):
        cell_ctes.append(
            f"""cells{i} AS (
      SELECT {cm_bucket_sql('item', i, CM_WIDTH)} AS bucket,
             COUNT(*) AS cnt
      FROM items GROUP BY 1
    )"""
        )
        probe_ctes.append(
            f"""SELECT d.item, c.cnt
       FROM distinct_items d
       JOIN cells{i} c ON c.bucket = {cm_bucket_sql('d.item', i, CM_WIDTH)}"""
        )
    return f"""
    WITH items AS (
      SELECT CAST(user_id AS VARCHAR) AS item FROM events
      WHERE user_id IS NOT NULL
    ),
    distinct_items AS (SELECT DISTINCT item FROM items),
    {", ".join(cell_ctes)},
    probes AS ({" UNION ALL ".join(probe_ctes)})
    SELECT item, CAST(MIN(cnt) AS BIGINT) AS est
    FROM probes GROUP BY item
    """


@register(
    "cm_count_estimates",
    oracle=_cm_oracle(),
    doc=f"Count-Min sketch point-count estimates (depth={CM_DEPTH} x "
    f"width={CM_WIDTH}) for every distinct user: the sketch is a "
    "CONSTANT depth*width cells of exact BIGINT counts regardless of "
    "key cardinality — the frequency analogue of the KMV distinct "
    "sketch and the MG heavy hitters, completing the portable sketch "
    "family (operators/sketches.py). Estimates are min-over-rows of "
    "md5-salted cells, so they never underestimate and both engines "
    "share every collision bit-for-bit — the approximation itself is "
    "value-hash-checked. Scale shape: one map-side-combined "
    "aggregation builds the sketch; probes broadcast the tiny cell "
    "table. The never-underestimate property is pinned in "
    "tests/test_operators.py.",
)
def cm_count_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cm_estimate, cm_sketch

    ev = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    items = ev.select(F.col("user_id").cast("string").alias("item"))
    sketch = cm_sketch(items, F.col("item"), CM_DEPTH, CM_WIDTH)
    distinct_items = items.distinct()
    return cm_estimate(sketch, distinct_items, "item", CM_DEPTH, CM_WIDTH)


# ---------------------------------------------------------------------------
# Approx-percentile twins with PINNED error bounds
# ---------------------------------------------------------------------------
#
# Spark's percentile_approx (Greenwald-Khanna) is the right tool for
# quantiles at 100 TB — one pass, O(accuracy * log n) state, mergeable
# partial sketches — but its output is not reproducible cross-engine,
# so it cannot be value-hash-checked directly. The twin pattern pins
# the sketch's CONTRACT instead (same device as ann_topk_ivfpq_rerank's
# recall >= 0.85 pin): the query recomputes the returned value's true
# rank against the data and emits within_bound = "rank error <= n/ACC
# (+1 boundary slack)"; the oracle emits the exact quantile_cont values
# with within_bound = TRUE. A sketch that violates its guarantee (or a
# broken bound derivation) flips the boolean and fails the value hash —
# the approximate path stays honest while the hashed output stays
# engine-portable.

PCT_ACC = 100  # GK accuracy parameter -> rank error <= n/PCT_ACC (1%)
PCT_QS = [0.25, 0.50, 0.75, 0.90, 0.99]
PCT_GROUP_QS = [0.50, 0.90]


def _pct_oracle_global() -> str:
    vals = ", ".join(f"({i + 1}, {q}e0)" for i, q in enumerate(PCT_QS))
    arr = ", ".join(f"{q}e0" for q in PCT_QS)
    return f"""
    WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
    qa AS (
      SELECT quantile_cont(value, [{arr}]) AS arr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM v
    )
    SELECT qs.q AS q,
           ROUND(arr[qs.i], 4) AS exact_value,
           n AS n,
           TRUE AS within_bound
    FROM qa, (VALUES {vals}) AS qs(i, q)
    """


@register(
    "approx_percentile_pinned",
    oracle=_pct_oracle_global(),
    doc="Global value quantiles via percentile_approx (Greenwald-"
    f"Khanna, accuracy={PCT_ACC}) with the sketch's rank-error "
    "guarantee PINNED: the plan recomputes each approximate answer's "
    "true rank (count of strictly-smaller / smaller-or-equal rows in "
    "ONE conditional-sum pass over the scan) and asserts it lies "
    f"within ceil(q*n) +/- (n/{PCT_ACC} + 1). Exact percentile ships "
    "alongside for the hash. Scale shape: the sketch pass is one "
    "map-side-mergeable agg; the verification pass is one more scan "
    "with a broadcast of a single sketch row — no sort, no per-key "
    "state. At 100 TB you run the sketch alone; the pinned twin is "
    "the correctness harness proving the sketch stays in contract.",
)
def approx_percentile_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select("value")
    qlist = ", ".join(f"{q}D" for q in PCT_QS)
    sketch = ev.agg(
        F.expr(f"approx_percentile(value, array({qlist}), {PCT_ACC})").alias("pa"),
        F.expr(f"percentile(value, array({qlist}))").alias("pe"),
        F.count(F.lit(1)).alias("n"),
    )
    lt_le = ev.crossJoin(F.broadcast(sketch)).agg(
        F.first("pa").alias("pa"),
        F.first("pe").alias("pe"),
        F.first("n").alias("n"),
        *[
            F.sum((F.col("value") < F.get("pa", i)).cast("long")).alias(f"lt{i}")
            for i in range(len(PCT_QS))
        ],
        *[
            F.sum((F.col("value") <= F.get("pa", i)).cast("long")).alias(f"le{i}")
            for i in range(len(PCT_QS))
        ],
    )
    eps = F.col("n") / PCT_ACC + 1
    rows = [
        F.struct(
            F.lit(q).alias("q"),
            F.round(F.get("pe", i), 4).alias("exact_value"),
            F.col("n").cast("bigint").alias("n"),
            (
                (F.col(f"lt{i}") <= F.ceil(F.lit(q) * F.col("n")) + eps)
                & (F.col(f"le{i}") >= F.ceil(F.lit(q) * F.col("n")) - eps)
            ).alias("within_bound"),
        )
        for i, q in enumerate(PCT_QS)
    ]
    return lt_le.select(F.inline(F.array(*rows)))


def _pct_oracle_groups() -> str:
    vals = ", ".join(f"({i + 1}, {q}e0)" for i, q in enumerate(PCT_GROUP_QS))
    arr = ", ".join(f"{q}e0" for q in PCT_GROUP_QS)
    return f"""
    WITH v AS (
      SELECT event_type, value FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    qa AS (
      SELECT event_type,
             quantile_cont(value, [{arr}]) AS arr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY event_type
    )
    SELECT qa.event_type AS event_type,
           qs.q AS q,
           ROUND(arr[qs.i], 4) AS exact_value,
           n AS n,
           TRUE AS within_bound
    FROM qa, (VALUES {vals}) AS qs(i, q)
    """


@register(
    "approx_percentile_by_type_pinned",
    oracle=_pct_oracle_groups(),
    doc="Per-event-type median and p90 via grouped percentile_approx "
    f"(accuracy={PCT_ACC}) with the same pinned rank-error contract "
    "as approx_percentile_pinned, exercising the GROUPED sketch path "
    "(one mergeable sketch per key). Verification joins the tiny "
    "per-type sketch row set back over the scan as a broadcast and "
    "recomputes ranks with conditional sums — one extra scan, one "
    "partial-aggregated shuffle on the group key, no sort. The "
    "grouped variant matters at scale: per-key GK sketches merge "
    "map-side, so a 100 TB groupBy-quantile never shuffles raw rows.",
)
def approx_percentile_by_type_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "value")
    )
    qlist = ", ".join(f"{q}D" for q in PCT_GROUP_QS)
    sketch = ev.groupBy("event_type").agg(
        F.expr(f"approx_percentile(value, array({qlist}), {PCT_ACC})").alias("pa"),
        F.expr(f"percentile(value, array({qlist}))").alias("pe"),
        F.count(F.lit(1)).alias("n"),
    )
    lt_le = (
        ev.join(F.broadcast(sketch), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("pa").alias("pa"),
            F.first("pe").alias("pe"),
            F.first("n").alias("n"),
            *[
                F.sum((F.col("value") < F.get("pa", i)).cast("long")).alias(f"lt{i}")
                for i in range(len(PCT_GROUP_QS))
            ],
            *[
                F.sum((F.col("value") <= F.get("pa", i)).cast("long")).alias(f"le{i}")
                for i in range(len(PCT_GROUP_QS))
            ],
        )
    )
    eps = F.col("n") / PCT_ACC + 1
    rows = [
        F.struct(
            F.lit(q).alias("q"),
            F.round(F.get("pe", i), 4).alias("exact_value"),
            F.col("n").cast("bigint").alias("n"),
            (
                (F.col(f"lt{i}") <= F.ceil(F.lit(q) * F.col("n")) + eps)
                & (F.col(f"le{i}") >= F.ceil(F.lit(q) * F.col("n")) - eps)
            ).alias("within_bound"),
        )
        for i, q in enumerate(PCT_GROUP_QS)
    ]
    return lt_le.select("event_type", F.inline(F.array(*rows)))


# HyperLogLog++ pinned twin: relative standard deviation passed to
# approx_count_distinct, and the sigma multiple the pin allows. 5 sigma
# over the sketch's own rsd never fires on a healthy implementation
# (and the small-cardinality sparse regime is exact), while a broken
# sketch or a silent precision regression flips the boolean and fails
# the driver hash.
HLL_RSD = 0.02
HLL_SIGMA = 5


@register(
    "hll_distinct_pinned",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_bound
    FROM events
    WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    GROUP BY event_type
    """,
    doc="Distinct users per event type via HyperLogLog++ "
    f"(approx_count_distinct, rsd={HLL_RSD}) with the sketch's error "
    f"contract PINNED: |approx - exact| <= {HLL_SIGMA} x rsd x exact "
    "(+2 absolute slack for the tiny-cardinality boundary). Exact "
    "distinct ships alongside as the hash anchor; the oracle emits "
    "the exact counts with within_bound TRUE — same device as the "
    "approx-percentile twins. Completes the sketch family (KMV "
    "hash-threshold, Misra-Gries, Count-Min, Bloom, GK percentile, "
    "HLL). At 100 TB only the HLL branch runs — mergeable fixed-size "
    "registers, no distinct shuffle; the exact branch here is the "
    "correctness harness.",
)
def hll_distinct_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    g = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", HLL_RSD).alias("approx"),
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct"),
    )
    tol = F.greatest(
        F.lit(HLL_SIGMA * HLL_RSD) * F.col("exact_distinct"), F.lit(2.0)
    )
    return g.select(
        "event_type",
        "exact_distinct",
        (F.abs(F.col("approx") - F.col("exact_distinct")) <= tol).alias(
            "within_bound"
        ),
    )
