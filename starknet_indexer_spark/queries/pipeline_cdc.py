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
fingerprint), roll a base-CDC_B polynomial hash over every char
k-gram, cut after each gram whose hash (mod CDC_P) ≡ 0 mod CDC_MOD
(expected chunk length ≈ CDC_MOD chars), md5 each chunk, and
aggregate the corpus-wide storage ledger: total vs unique chunk bytes
and the achievable dedup savings. Everything is exact integer
arithmetic (byte counts, one ppm rounding at the end), so the DuckDB
oracle value-hash-proves the chunker each run.

Scale shape: chunking is ONE Arrow-batched map-only mapInPandas pass
(vectorized int64 convolution for boundaries — see _cdc_chunks; no
shuffle until the chunk-hash aggregate); the single shuffle is a
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
#: polynomial rolling-hash parameters (the winnowing_fingerprint
#: family): gram hash = fold of char codes, acc*B + c, taken mod P.
#: B^(K-1)*max_code*K ~ 3.5e12 — exact in int64 BEFORE the mod, so the
#: numpy convolution and DuckDB's HUGEINT list_reduce agree bit-for-bit
CDC_B = 31
CDC_P = 1_000_000_007


def _cdc_chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_hash, chunk_len) — one row per content-defined
    chunk. Docs whose normalized text is shorter than CDC_K carry no
    gram window and are excluded (the winnowing_fingerprint
    convention; the oracle mirrors the filter).

    The chunker is ONE Arrow-batched mapInPandas pass (map-only, fuses
    with the scan): the boundary test is a vectorized integer
    convolution (np.convolve of the char codes with the [B^(K-1)..B^0]
    kernel — exact int64, see CDC_B), and chunk hashing is one
    hashlib.md5 per CHUNK (~L/CDC_MOD per doc), not per gram. The
    first per-gram version ran the boundary md5 inside a Catalyst HOF
    lambda — interpreted per element, ~2x the wall of this kernel at
    sf0.1 (3.5 -> 1.6-2.3 s steady) — the same adjudication as the pHash fingerprint
    (pipeline_multimodal.phash_fingerprints). Normalization stays
    JVM-side so both engines share one regexp semantics."""
    import hashlib

    import numpy as np
    import pandas as pd

    t = F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9]+", " "))
    base = docs.select("doc_id", t.alias("t")).filter(
        F.length("t") >= CDC_K
    )
    kernel = np.array(
        [CDC_B ** (CDC_K - 1 - j) for j in range(CDC_K)], dtype=np.int64
    )

    def batch_fn(batches):
        for pdf in batches:
            ids, hashes, lens = [], [], []
            for doc_id, txt in zip(pdf["doc_id"], pdf["t"]):
                raw = txt.encode("ascii")  # one encode per doc; chunks
                # hash byte slices of it (identical digests)
                c = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                # h[i] = sum_j c[i+j] * B^(K-1-j), exact int64; 'valid'
                # convolution needs the kernel reversed
                h = np.convolve(c, kernel[::-1], mode="valid") % CDC_P
                # cut after char index (i + K - 1) for boundary grams,
                # 1-based gram index i -> 0-based char cut position
                cuts = np.flatnonzero(h % CDC_MOD == 0) + CDC_K
                cuts = np.unique(np.concatenate(([0], cuts, [len(c)])))
                for a, b in zip(cuts[:-1], cuts[1:]):
                    ids.append(doc_id)
                    hashes.append(hashlib.md5(raw[a:b]).hexdigest())
                    lens.append(b - a)
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_hash": hashes, "chunk_len": lens}
            )

    return base.mapInPandas(
        batch_fn, "doc_id long, chunk_hash string, chunk_len long"
    )


def storage_ledger(per_hash: DataFrame) -> DataFrame:
    """Corpus storage ledger from a (chunk_hash, n_copies, chunk_len)
    relation — ONE definition shared by the batch ``cdc_chunk_dedup``
    query and the streaming chunk ledger (streaming/cdc_ledger.py), so
    stream == batch holds by shared code. Exact integer byte
    accounting; one ppm rounding at the end."""
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


@register(
    "cdc_chunk_dedup",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id,
             lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')) AS t
      FROM documents
    ),
    base AS (
      SELECT doc_id, t, len(t) AS L,
             list_transform(string_split(t, ''), c -> ascii(c)::BIGINT) AS cs
      FROM norm WHERE len(t) >= {CDC_K}
    ),
    cutsrel AS (
      SELECT doc_id, t,
             list_sort(list_distinct(list_concat(list_concat(
               [CAST(0 AS BIGINT)],
               [CAST(i + {CDC_K} - 1 AS BIGINT)
                FOR i IN range(1, L - {CDC_K} + 2)
                IF (list_reduce(cs[i:i + {CDC_K} - 1],
                                (acc, c) -> acc * {CDC_B} + c)
                    % {CDC_P}) % {CDC_MOD} = 0]),
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
    f"(rsync/LBFS lineage): normalized text cut wherever the base-"
    f"{CDC_B} polynomial hash (mod {CDC_P}) of the trailing "
    f"{CDC_K}-char window ≡ 0 mod {CDC_MOD} (expected chunk "
    f"~{CDC_MOD} chars), so boundaries follow content and survive the "
    "insert/delete edits that shift every fixed-size block — the "
    "property that lets near-duplicate documents share most of their "
    "chunks. Output is the corpus storage ledger: chunk counts, total "
    "vs duplicate bytes, and the achievable savings in ppm (exact "
    "integer byte accounting, one final rounding). Complements the "
    "document-level dedup family with the block-level answer a "
    "data-lake storage team needs. Scale shape: chunking is one "
    "Arrow-batched map-only mapInPandas pass (vectorized int64 "
    "convolution for boundaries, one md5 per CHUNK — the DuckDB "
    "oracle replays the identical fold in HUGEINT list_reduce); the "
    "only shuffle is the map-side-combined chunk-hash aggregate "
    "(bounded by unique content); the ledger is one tiny agg.",
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _cdc_chunks(load(spark, sf_dir, "documents"))
    per_hash = rows.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.max("chunk_len").alias("chunk_len"),
    )
    return storage_ledger(per_hash)
