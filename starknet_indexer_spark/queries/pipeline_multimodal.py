"""Multimodal pipeline queries: binary payload + typed metadata,
Arrow-batched Python decode stubs (functions.multimodal).

Oracle strategy: metadata and frame sampling are replayed exactly by
DuckDB (byte lengths via octet_length, frame fingerprints in the
uppercase-hex domain); the feature extractor is genuinely non-SQL
(per-byte numeric folds over BLOBs) and registers rows-only, with a
pure-python equivalence test in tests/test_multimodal.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.multimodal import (
    MAX_SAMPLED_FRAMES,
    extract_features,
    media_expr,
    metadata_exprs,
    modality_expr,
    sample_frames,
)
from .registry import register

_META_SQL = """
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             hex(encode(text)) AS hx
      FROM documents
"""


@register(
    "multimodal_metadata",
    oracle="""
    WITH m AS (
      SELECT doc_id, source, encode(text) AS media FROM documents
    )
    SELECT doc_id,
           CASE ('0x' || substr(md5(source), 1, 2))::BIGINT % 3
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           octet_length(media)::BIGINT AS n_bytes,
           (32 + octet_length(media) % 97)::BIGINT AS width,
           (32 + (octet_length(media) // 97) % 97)::BIGINT AS height,
           (1 + octet_length(media) % 16)::BIGINT AS n_frames
    FROM m
    """,
    doc="Typed metadata over an opaque binary media column: modality "
    "tag + byte length + (stub-)decoded dimensions. JVM-side "
    "projection — the filter/prune layer that runs BEFORE any Python "
    "decode cost at 100 TB.",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    media = media_expr(F.col("text"))
    meta = metadata_exprs(media)
    return docs.select(
        "doc_id",
        modality_expr(F.col("source")).alias("modality"),
        *[c.alias(k) for k, c in meta.items()],
    )


def _frame_oracle() -> str:
    # replay _frame_geometry per k: idx = (k*n_frames)//n_samp,
    # n_samp = least(n_frames, MAX); frame bytes via hex-substring
    selects = []
    for k in range(MAX_SAMPLED_FRAMES):
        selects.append(f"""
      SELECT doc_id,
             ({k} * n_frames) // n_samp AS frame_idx,
             (({k} * n_frames) // n_samp) * frame_len AS byte_offset,
             frame_len,
             md5(substr(hx, (({k} * n_frames) // n_samp) * frame_len * 2 + 1,
                 frame_len * 2)) AS frame_md5
      FROM geo WHERE {k} < n_samp""")
    union = "\n      UNION ALL\n".join(selects)
    return f"""
    WITH m AS ({_META_SQL}),
    geo AS (
      SELECT doc_id, hx,
             (1 + n_bytes % 16)::BIGINT AS n_frames,
             GREATEST(n_bytes // (1 + n_bytes % 16), 1)::BIGINT AS frame_len,
             LEAST((1 + n_bytes % 16), {MAX_SAMPLED_FRAMES})::BIGINT AS n_samp
      FROM m
    )
    SELECT doc_id, frame_idx::BIGINT AS frame_idx, byte_offset::BIGINT AS byte_offset,
           frame_len, frame_md5 FROM (
{union}
    )
    """


@register(
    "multimodal_frame_sample",
    oracle=_frame_oracle(),
    doc="Frame sampling via mapInPandas: up to 4 evenly-spaced frames "
    "per video payload, each fingerprinted (md5 over hex domain). The "
    "Arrow-batched Python stage is the real plumbing a video decoder "
    "drops into; the oracle replays the identical geometry in SQL.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    media = media_expr(F.col("text"))
    n_frames = metadata_exprs(media)["n_frames"]
    return sample_frames(
        docs.select("doc_id", media.alias("media"), n_frames.alias("n_frames"))
    )


def _feature_oracle() -> str:
    """Per-chunk byte means as DuckDB list folds. The corpus text is
    pure ASCII (asserted at all scale factors), so ord(char) == byte
    and the BLOB fold is expressible over the string form — which
    upgrades this query from rows-only to a full value-hash check."""
    cols = []
    for i in range(8):
        lo = f"{i} * step"
        hi = f"LEAST(({i} + 1) * step, n)"
        mean = (
            f"ROUND(list_sum([ord(text[p + 1]) FOR p IN range({lo}, {hi})])"
            f" / (255.0 * ({hi} - {lo})), 6)"
        )
        cols.append(f"CASE WHEN {lo} < n THEN {mean} ELSE 0.0 END AS f{i}")
    sel = ",\n           ".join(cols)
    return f"""
    WITH g AS (
      SELECT doc_id, length(text) AS n,
             GREATEST(length(text) // 8, 1) AS step, text
      FROM documents
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
           {sel}
    FROM g
    """


@register(
    "multimodal_feature_extract",
    oracle=_feature_oracle(),
    doc="Feature extraction stub via mapInPandas: 8 chunk byte-mean "
    "features per payload — the embedding-model stand-in (Arrow-batched "
    "vectorized Python, the shape a real encoder forward pass uses). "
    "Features are emitted as scalar columns so the driver value-hash "
    "covers them; exact equivalence vs a pure-python reference is "
    "additionally pinned in tests/test_multimodal.py.",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    media = media_expr(F.col("text"))
    feats = extract_features(docs.select("doc_id", media.alias("media")))
    return feats.select(
        "doc_id",
        "n_bytes",
        *[F.col("features")[i].alias(f"f{i}") for i in range(8)],
    )


# ---------------------------------------------------------------------------
# Binary near-dup: SimHash over the payload's byte shingles
# ---------------------------------------------------------------------------

_BIN_GRAM = 8  # hex chars = 4 bytes per shingle


def _binary_simhash_oracle() -> str:
    from .pipeline_dedup import MAX_HAMMING, SIMHASH_BAND_BITS, SIMHASH_BITS, SIMHASH_N_BANDS

    votes = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{i}"
        for i in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN v_{i} > 0 THEN {1 << i} ELSE 0 END)::BIGINT"
        for i in range(SIMHASH_BITS)
    )
    band_selects = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, fingerprint, {j} AS band, "
        f"(fingerprint >> {j * SIMHASH_BAND_BITS}) & {(1 << SIMHASH_BAND_BITS) - 1}"
        " AS band_val FROM fps"
        for j in range(SIMHASH_N_BANDS)
    )
    return f"""
    WITH media AS (
      SELECT doc_id, hex(encode(text)) AS hx FROM documents
    ),
    toks AS (
      SELECT doc_id,
             [substr(hx, i, {_BIN_GRAM})
              for i in range(1, GREATEST(length(hx) - {_BIN_GRAM - 1}, 0) + 1,
                             {_BIN_GRAM})]
               AS tokens
      FROM media WHERE length(hx) >= {_BIN_GRAM}
    ),
    th AS (
      SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
      FROM (SELECT doc_id, UNNEST(tokens) AS token FROM toks)
    ),
    votes AS (
      SELECT doc_id,
             {votes}
      FROM th GROUP BY doc_id
    ),
    fps AS (SELECT doc_id, {fp} AS fingerprint FROM votes),
    bands AS (
{band_selects}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             a.fingerprint AS a_fp, b.fingerprint AS b_fp
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    )
    SELECT a_id, b_id, bit_count(xor(a_fp, b_fp)) AS hamming
    FROM pairs WHERE bit_count(xor(a_fp, b_fp)) <= {MAX_HAMMING}
    """


@register(
    "multimodal_binary_near_dup",
    oracle=_binary_simhash_oracle(),
    doc="Near-duplicate detection over the OPAQUE binary media column "
    "— the media analogue of text SimHash (the stand-in for image "
    "perceptual-hash dedup; a real pHash replaces the shingle "
    "fingerprint behind the same banding/verify plumbing): "
    "non-overlapping 4-byte blocks of the payload's hex (block "
    "fingerprinting — 8x fewer shingles than a dense slide; real "
    "pHash works in the decoded pixel domain anyway) -> 32-bit "
    "SimHash majority vote "
    "(one map-side-combined shuffle) -> byte-band pigeonhole blocking "
    "-> exact hamming verify on colliding pairs only. Everything is "
    "JVM-side column work over BinaryType — no Python decode in the "
    "pipeline; at 100 TB the fingerprint pass is scan-fused and the "
    "only join touches band-colliding candidates.",
)
def multimodal_binary_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_fingerprint_tokens, simhash_near_pairs
    from .pipeline_dedup import MAX_HAMMING

    docs = load(spark, sf_dir, "documents")
    hx = F.hex(media_expr(F.col("text")))
    grams = F.when(
        F.length(hx) >= _BIN_GRAM,
        F.transform(
            F.sequence(
                F.lit(1), F.length(hx) - F.lit(_BIN_GRAM - 1), F.lit(_BIN_GRAM)
            ),
            lambda i: hx.substr(i, F.lit(_BIN_GRAM)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    fps = simhash_fingerprint_tokens(
        docs.filter(F.length(hx) >= _BIN_GRAM), grams
    )
    return simhash_near_pairs(fps, MAX_HAMMING)
