"""Content-defined chunking (CDC) storage-dedup estimator.

The document-level dedup family (exact hash, MinHash, containment,
substring spans) answers "which DOCUMENTS are copies"; a 100 TB data
lake ALSO deduplicates at the storage layer, where the unit is the
content-defined chunk (rsync/LBFS/casync lineage): cut the byte stream
wherever a rolling hash over a small window hits a fixed pattern, so
chunk boundaries follow CONTENT, not offsets — an insertion early in a
document shifts every fixed-size block but leaves all content-defined
chunks after the edit region identical, which is what makes chunk-hash
dedup robust to the near-duplicate edits this corpus is full of.

``cdc_chunk_dedup`` runs the whole estimator: normalize text (the
byte-stream stand-in, same normalization as the winnowing
fingerprint), hash every char k-gram (the rolling window), cut after
each gram whose 60-bit hash ≡ 0 mod CDC_MOD (expected chunk length ≈
CDC_MOD chars), hash each chunk, and aggregate the corpus-wide
storage ledger: total vs unique chunk bytes and the achievable
dedup savings. Everything is exact integer arithmetic (byte counts,
one ppm rounding at the end), so the DuckDB oracle value-hash-proves
the chunker each run.

Scale shape: chunking is MAP-ONLY nested array expressions per row
(no shuffle until the chunk-hash aggregate); the single shuffle is a
map-side-combined groupBy on chunk_hash whose cardinality is bounded
by unique content, not corpus size; the final ledger is one tiny agg.
At 100 TB this is exactly the dedup estimator a storage team runs
before enabling chunk-level dedup on a lake — per-source ledgers fall
out of the same aggregate keyed by (source, chunk_hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

#: rolling-window width (chars) — the gram the boundary test hashes
CDC_K = 8
#: boundary when gram_hash % CDC_MOD == 0 -> expected chunk ~CDC_MOD chars
CDC_MOD = 32


def _cdc_chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_hash, chunk_len) — one row per content-defined
    chunk. Docs whose normalized text is shorter than CDC_K carry no
    gram window and are excluded (the winnowing_fingerprint
    convention; the oracle mirrors the filter)."""
    t = F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9]+", " "))
    base = docs.select("doc_id", t.alias("t")).filter(
        F.length("t") >= CDC_K
    )
    # gram hashes: md5-based 60-bit (the repo's engine-portable hash),
    # one per window position 1..L-K+1
    bh = F.expr(
        f"transform(sequence(1, length(t) - {CDC_K} + 1),"
        f" i -> CAST(conv(substring(md5(substring(t, i, {CDC_K})), 1, 15),"
        f" 16, 10) AS BIGINT))"
    )
    # cut positions: 0, after each boundary gram (char index i+K-1),
    # and L — distinct-sorted so a boundary at the doc end collapses
    cuts = F.expr(
        f"array_sort(array_distinct(concat(array(0L),"
        f" transform(filter(sequence(1, size(bh)),"
        f" i -> element_at(bh, i) % {CDC_MOD} = 0),"
        f" i -> CAST(i + {CDC_K} - 1 AS BIGINT)),"
        f" array(CAST(length(t) AS BIGINT)))))"
    )
    chunks = F.expr(
        "transform(sequence(1, size(cuts) - 1),"
        " j -> substring(t, CAST(element_at(cuts, j) + 1 AS INT),"
        " CAST(element_at(cuts, j + 1) - element_at(cuts, j) AS INT)))"
    )
    return (
        base.withColumn("bh", bh)
        .withColumn("cuts", cuts)
        .select("doc_id", F.explode(chunks).alias("chunk"))
        .select(
            "doc_id",
            F.md5("chunk").alias("chunk_hash"),
            F.length("chunk").cast("bigint").alias("chunk_len"),
        )
    )


@register(
    "cdc_chunk_dedup",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id,
             lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')) AS t
      FROM documents
    ),
    base AS (SELECT doc_id, t, len(t) AS L FROM norm WHERE len(t) >= {CDC_K}),
    cutsrel AS (
      SELECT doc_id, t,
             list_sort(list_distinct(list_concat(list_concat(
               [CAST(0 AS BIGINT)],
               [CAST(i + {CDC_K} - 1 AS BIGINT)
                FOR i IN range(1, L - {CDC_K} + 2)
                IF ('0x' || substr(md5(t[i:i + {CDC_K} - 1]), 1, 15))::BIGINT
                   % {CDC_MOD} = 0]),
               [CAST(L AS BIGINT)]))) AS cuts
      FROM base
    ),
    chunks AS (
      SELECT doc_id,
             UNNEST([t[cuts[j] + 1:cuts[j + 1]]
                     FOR j IN range(1, len(cuts))]) AS chunk
      FROM cutsrel
    ),
    rows_ AS (
      SELECT doc_id, md5(chunk) AS chunk_hash,
             CAST(length(chunk) AS BIGINT) AS chunk_len
      FROM chunks
    ),
    per_hash AS (
      SELECT chunk_hash, COUNT(*) AS n_copies, MAX(chunk_len) AS chunk_len
      FROM rows_ GROUP BY chunk_hash
    )
    SELECT CAST(SUM(n_copies) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
           CAST(SUM(n_copies * chunk_len) AS BIGINT) AS total_bytes,
           CAST(SUM((n_copies - 1) * chunk_len) AS BIGINT) AS dup_bytes,
           CAST(FLOOR(1000000.0 * SUM((n_copies - 1) * chunk_len)
                      / GREATEST(SUM(n_copies * chunk_len), 1) + 0.5)
                AS BIGINT) AS savings_ppm
    FROM per_hash
    """,
    doc=f"Content-defined-chunking storage-dedup estimator "
    f"(rsync/LBFS lineage): normalized text cut wherever the 60-bit "
    f"hash of the trailing {CDC_K}-char window ≡ 0 mod {CDC_MOD} "
    f"(expected chunk ~{CDC_MOD} chars), so boundaries follow content "
    "and survive the insert/delete edits that shift every fixed-size "
    "block — the property that lets near-duplicate documents share "
    "most of their chunks. Output is the corpus storage ledger: chunk "
    "counts, total vs duplicate bytes, and the achievable savings in "
    "ppm (exact integer byte accounting, one final rounding). "
    "Complements the document-level dedup family with the block-level "
    "answer a data-lake storage team needs. Scale shape: chunking is "
    "map-only nested array expressions fused with the scan; the only "
    "shuffle is the map-side-combined chunk-hash aggregate (bounded "
    "by unique content); the ledger is one tiny agg.",
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _cdc_chunks(load(spark, sf_dir, "documents"))
    per_hash = rows.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.max("chunk_len").alias("chunk_len"),
    )
    return per_hash.agg(
        F.sum("n_copies").cast("bigint").alias("n_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique_chunks"),
        F.sum(F.col("n_copies") * F.col("chunk_len"))
        .cast("bigint")
        .alias("total_bytes"),
        F.sum((F.col("n_copies") - 1) * F.col("chunk_len"))
        .cast("bigint")
        .alias("dup_bytes"),
        F.floor(
            F.lit(1000000.0)
            * F.sum((F.col("n_copies") - 1) * F.col("chunk_len"))
            / F.greatest(F.sum(F.col("n_copies") * F.col("chunk_len")), F.lit(1))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("savings_ppm"),
    )
