"""MinHash+LSH and SimHash near-duplicate queries over ``documents``.

Both are end-to-end sketches: signature → banding → candidate join →
verify. The oracle SQL is *generated from the same literal constants*
(`operators.dedup.MINHASH_PARAMS`, band geometry) so DuckDB replays the
identical pipeline — candidate generation included — and the driver's
value-hash comparison is exact.

Scale shape (100 TB): signature computation is map-only; the only wide
stages are (1) the band-bucket equi-join (shuffle on band_key, bucket
population bounded by banding width) and (2) the verify join, which
touches only the candidate pairs — a vanishing fraction of N^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.dedup import (
    MINHASH_P,
    MINHASH_PARAMS,
    N_BANDS,
    ROWS_PER_BAND,
    SIMHASH_BAND_BITS,
    SIMHASH_BITS,
    SIMHASH_N_BANDS,
    cap_hot_bands,
    lsh_candidate_pairs,
    md5_hash60_expr,
    minhash_bands,
    minhash_signature_exprs,
    simhash_fingerprint,
    simhash_near_pairs,
    tokens_expr,
    word_shingles_expr,
)
from .registry import register

# Threshold compared against the 6dp-ROUNDED jaccard on BOTH engines
# (the Spark path filters F.round(jac, 6) — an unrounded oracle WHERE
# would flip boundary pairs like raw 0.1999996 across engines)
JACCARD_MIN = 0.2
# strictly below SIMHASH_N_BANDS: pigeonhole makes the banded join
# *exact* (zero false negatives), not just high-recall
MAX_HAMMING = 3
# "newly crawled batch" split for the incremental dedup query: a
# deterministic 1-in-5 of doc_ids stands in for the latest crawl
NEW_BATCH_MOD = 5
# held-out split for decontamination: one crawl source is the eval set
EVAL_SOURCE = "src0"
# n-gram width lives in silver.py (the materialized relation and the
# self-contained queries must agree)
from ..silver import DECONTAM_N  # noqa: E402

_TOKS_SQL = r"""
    SELECT doc_id,
           list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                       ' '), x -> x <> '') AS tokens
    FROM documents
"""

_SH_SQL = """
    SELECT doc_id,
           list_distinct([tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
                          for i in range(1, len(tokens) - 1)]) AS shingles
    FROM toks WHERE len(tokens) >= 3
"""


def _minhash_oracle(band_cap: int | None = None) -> str:
    cap_clause = (
        f"\n      QUALIFY COUNT(*) OVER (PARTITION BY band, band_key)"
        f" <= {band_cap}" if band_cap else ""
    )
    sig_cols = ",\n             ".join(
        f"list_min(list_transform(h, x -> ({a} * (x % {MINHASH_P}) + {b}) % {MINHASH_P}))"
        f" AS sig_{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    )
    band_selects = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(
            f"sig_{b * ROWS_PER_BAND + r}::VARCHAR" for r in range(ROWS_PER_BAND)
        )
        + " AS band_key FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
    WITH toks AS ({_TOKS_SQL}),
    sh AS ({_SH_SQL}),
    hs AS (
      SELECT doc_id,
             list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
             {sig_cols}
      FROM hs
    ),
    bands0 AS (
{band_selects}
    ),
    bands AS (
      SELECT doc_id, band, band_key FROM bands0{cap_clause}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT c.a_id, c.b_id,
           len(list_intersect(sa.shingles, sb.shingles)) AS inter,
           ROUND(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / (len(sa.shingles) + len(sb.shingles)
                    - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.a_id
    JOIN sh sb ON sb.doc_id = c.b_id
    WHERE ROUND(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          / (len(sa.shingles) + len(sb.shingles)
             - len(list_intersect(sa.shingles, sb.shingles))), 6) >= {JACCARD_MIN}
    """


def _verify_candidates(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact-Jaccard verification of LSH candidate pairs against the
    shingle relation — the one verify stage shared by the re-deriving,
    capped, and silver-reading variants. The pair join is the pruner:
    only candidate-matched shingle rows are read, and AQE broadcasts
    the tiny candidate side."""
    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    jac = inter.cast("double") / (F.size("a_sh") + F.size("b_sh") - inter)
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            inter.alias("inter"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_MIN)
    )


@register(
    "minhash_lsh_dedup",
    oracle=_minhash_oracle(),
    doc="MinHash(16 perms) + LSH(8 bands × 2 rows) near-dup detection: "
    "shingle → signature (map-only array folds) → band-bucket equi-join "
    "for candidates → exact-Jaccard verify on candidates only. The "
    "banded join replaces the N^2 comparison — the 100 TB dedup path. "
    "Verify work is bounded by |candidates| via the pair join itself; "
    "at deployment scale the shingle relation is materialized once at "
    "ingest rather than re-derived per query.",
)
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the tokenize->shingle->hash->signature->band chain is silver.
    # build_silver_relations — ONE definition shared with the silver
    # materializer and the capped variant, so the re-deriving and
    # silver-reading twins cannot diverge. (The shingle relation is
    # lazily localCheckpointed inside: three consumers — signatures +
    # both verify sides — read one materialization; re-deriving the
    # regex chain per consumer measured ~20% of steady wall at sf0.1.)
    from ..silver import build_silver_relations

    # materialize_bands=True (r12): the band relation feeds both
    # candidate-join sides — one signature evaluation instead of two
    sh, bands = build_silver_relations(
        load(spark, sf_dir, "documents"), materialize_bands=True
    )
    # Verify stage joins the shingle relation twice. The pair join
    # itself is the pruner: only rows matching a candidate id are kept,
    # and AQE broadcasts the (tiny) candidate side, so no shuffle of
    # the shingle relation occurs.
    return _verify_candidates(lsh_candidate_pairs(bands), sh)


@register(
    "minhash_lsh_dedup_silver",
    oracle=_minhash_oracle(),
    doc="MinHash+LSH near-dup detection reading the MATERIALIZED "
    "silver relations (silver.ensure_silver: doc_shingles + "
    "minhash_bands, built once at ingest) instead of re-deriving the "
    "tokenize->shingle->hash->signature chain from raw text. Same "
    "output and oracle as minhash_lsh_dedup — the derivation lives in "
    "ONE place (silver.build_silver_relations) so the two cannot "
    "diverge. This is the deployed shape: at 100 TB the shingle/band "
    "chain is ingest work paid once per novel document "
    "(materialize_silver incremental mode), and every dedup query "
    "starts from the clustered band relation. Bench delta vs the "
    "re-deriving twin is recorded in SCALE.md.",
)
def minhash_lsh_dedup_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..silver import ensure_silver

    root = ensure_silver(spark, sf_dir)
    sh = spark.read.parquet(os.path.join(root, "doc_shingles"))
    bands = spark.read.parquet(os.path.join(root, "minhash_bands"))
    return _verify_candidates(lsh_candidate_pairs(bands), sh)


# Tight enough to bite on the sf corpora (their hottest band buckets
# reach 4, so the driver row proves the cap path, not the
# passthrough). Production corpora set this orders of magnitude
# higher — the point is bounding boilerplate mega-buckets (10^4+
# docs), not trimming ordinary collisions.
BAND_CAP = 3


@register(
    "minhash_lsh_dedup_capped",
    oracle=_minhash_oracle(band_cap=BAND_CAP),
    doc="MinHash+LSH near-dup detection with hot-band capping: band "
    "buckets larger than BAND_CAP (boilerplate mega-buckets — the LSH "
    "straggler/pair-explosion scale-killer) are dropped before the "
    "candidate join, bounding per-bucket work at O(cap^2) while "
    "similar pairs keep their cooler bands. The cap is one window "
    "count over the same (band, band_key) key the candidate join "
    "shuffles on — the exchange is reused, no extra shuffle. Output "
    "is provably a subset of the uncapped pairs (exactness-tested in "
    "tests/test_operators.py).",
)
def minhash_lsh_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..silver import build_silver_relations

    # materialize_bands=True (r12): the capped band relation feeds both
    # candidate-join sides (through the cap window) — one signature
    # evaluation instead of two
    sh, bands = build_silver_relations(
        load(spark, sf_dir, "documents"), materialize_bands=True
    )
    return _verify_candidates(
        lsh_candidate_pairs(cap_hot_bands(bands, BAND_CAP)), sh
    )


def _simhash_oracle() -> str:
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
    WITH toks AS ({_TOKS_SQL}),
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
    "simhash_dedup",
    oracle=_simhash_oracle(),
    doc="SimHash(32-bit) near-dup detection: per-bit token majority "
    "vote (one shuffle on doc_id with map-side combine), byte-band "
    "pigeonhole blocking, hamming verify on colliding pairs only. "
    f"Threshold {MAX_HAMMING} < {SIMHASH_N_BANDS} bands, so blocking "
    "is exact — zero false negatives by pigeonhole.",
)
def simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    fps = simhash_fingerprint(docs)
    # materialize=True (r12): the word-token fingerprint pass feeds
    # both band-join sides — one evaluation instead of two
    return simhash_near_pairs(fps, MAX_HAMMING, materialize=True)


def _incremental_oracle() -> str:
    sig_cols = ",\n             ".join(
        f"list_min(list_transform(h, x -> ({a} * (x % {MINHASH_P}) + {b}) % {MINHASH_P}))"
        f" AS sig_{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    )
    band_selects = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(
            f"sig_{b * ROWS_PER_BAND + r}::VARCHAR" for r in range(ROWS_PER_BAND)
        )
        + " AS band_key FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
    WITH toks AS ({_TOKS_SQL}),
    sh AS ({_SH_SQL}),
    hs AS (
      SELECT doc_id,
             list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
             {sig_cols}
      FROM hs
    ),
    bands AS (
{band_selects}
    ),
    cand AS (
      SELECT DISTINCT c.doc_id AS corpus_id, n.doc_id AS new_id
      FROM bands c JOIN bands n
        ON c.band = n.band AND c.band_key = n.band_key
      WHERE c.doc_id % {NEW_BATCH_MOD} <> 0 AND n.doc_id % {NEW_BATCH_MOD} = 0
    )
    SELECT c.corpus_id, c.new_id,
           len(list_intersect(sc.shingles, sn.shingles)) AS inter,
           ROUND(CAST(len(list_intersect(sc.shingles, sn.shingles)) AS DOUBLE)
                 / (len(sc.shingles) + len(sn.shingles)
                    - len(list_intersect(sc.shingles, sn.shingles))), 6) AS jaccard
    FROM cand c
    JOIN sh sc ON sc.doc_id = c.corpus_id
    JOIN sh sn ON sn.doc_id = c.new_id
    WHERE ROUND(CAST(len(list_intersect(sc.shingles, sn.shingles)) AS DOUBLE)
          / (len(sc.shingles) + len(sn.shingles)
             - len(list_intersect(sc.shingles, sn.shingles))), 6) >= {JACCARD_MIN}
    """


@register(
    "minhash_dedup_incremental",
    oracle=_incremental_oracle(),
    doc="Incremental MinHash dedup: compare ONLY a new document batch "
    "(deterministic 1-in-5 of doc_ids, standing in for the latest "
    "crawl) against the existing corpus's LSH band index — never "
    "corpus-vs-corpus. This is the crawl-refresh path at 100 TB: the "
    "corpus band index is a persisted table maintained at ingest, the "
    "new batch's bands and shingles are tiny and BROADCAST, so the "
    "candidate probe and the verify join are both map-side — zero "
    "shuffle of corpus data. Within-batch duplicates are the existing "
    "minhash_lsh_dedup run on the batch alone. Equivalence to the "
    "full-corpus recompute (the reference's own incremental-vs-view "
    "oracle pattern, src/dao.ts:510-515) is pytest-checked.",
)
def minhash_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % NEW_BATCH_MOD == 0
    toks = docs.select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
    sh = toks.filter(F.size("tokens") >= 3).select(
        "doc_id", word_shingles_expr(F.col("tokens")).alias("shingles")
    )
    # four consumers (bands x2, verify sides x2) — materialize once
    sh = sh.localCheckpoint(eager=False)

    def bands_of(side: DataFrame) -> DataFrame:
        hs = side.select("doc_id", F.transform("shingles", md5_hash60_expr).alias("h"))
        return minhash_bands(hs.select("doc_id", *minhash_signature_exprs(F.col("h"))))

    corpus_bands = bands_of(sh.filter(~is_new)).select(
        F.col("doc_id").alias("corpus_id"), "band", "band_key"
    )
    new_bands = bands_of(sh.filter(is_new)).select(
        F.col("doc_id").alias("new_id"), "band", "band_key"
    )
    cand = (
        corpus_bands.join(F.broadcast(new_bands), ["band", "band_key"])
        .select("corpus_id", "new_id")
        .distinct()
    )

    sc_ = sh.filter(~is_new).select(
        F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("c_sh")
    )
    sn = sh.filter(is_new).select(
        F.col("doc_id").alias("new_id"), F.col("shingles").alias("n_sh")
    )
    inter = F.size(F.array_intersect("c_sh", "n_sh"))
    jac = inter.cast("double") / (F.size("c_sh") + F.size("n_sh") - inter)
    return (
        cand.join(sc_, "corpus_id")
        .join(F.broadcast(sn), "new_id")
        .select(
            "corpus_id",
            "new_id",
            inter.alias("inter"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_MIN)
    )


_TOKS_SRC_SQL = r"""
    SELECT doc_id, source,
           list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                       ' '), x -> x <> '') AS tokens
    FROM documents
"""

_NGRAM5_TERM = " || ' ' || ".join(f"tokens[i+{j}]" for j in range(DECONTAM_N))


_DECONTAM_ORACLE = f"""
    WITH toks AS ({_TOKS_SRC_SQL}),
    ng AS (
      SELECT doc_id, source,
             list_distinct([{_NGRAM5_TERM}
                            for i in range(1, len(tokens) - {DECONTAM_N - 2})]) AS grams
      FROM toks WHERE len(tokens) >= {DECONTAM_N}
    ),
    g AS (
      SELECT doc_id, source, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
      FROM (SELECT doc_id, source, UNNEST(grams) AS gram FROM ng)
    ),
    train AS (SELECT DISTINCT gh FROM g WHERE source <> '{EVAL_SOURCE}'),
    ev AS (SELECT doc_id, gh FROM g WHERE source = '{EVAL_SOURCE}')
    SELECT ev.doc_id,
           COUNT(*) AS n_ngrams,
           CAST(SUM(CASE WHEN t.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           FLOOR(CAST(SUM(CASE WHEN t.gh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) * 1e6 + 0.5) / 1e6 AS containment
    FROM ev LEFT JOIN train t USING (gh)
    GROUP BY ev.doc_id
    """


@register(
    "decontamination_ngram",
    oracle=_DECONTAM_ORACLE,
    doc=f"Train/eval decontamination: fraction of each held-out "
    f"document's distinct {DECONTAM_N}-word n-grams that appear "
    f"anywhere in the training split (source != '{EVAL_SOURCE}'). "
    "N-grams are reduced to 60-bit md5 hashes BEFORE the join, so the "
    "shuffle key is fixed-width regardless of n-gram text length; the "
    "train set is deduped with map-side partial aggregation before the "
    "probe. At 100 TB the train n-gram set is a bucketed silver table "
    "(or a bloom-filter pre-pass) — the eval probe side is tiny by "
    "construction, so the join degenerates to a broadcast in the "
    "common case. Rounding uses FLOOR(x*1e6+0.5)/1e6 on both engines "
    "(round() half-way behavior differs between Spark and DuckDB).",
)
def decontamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..silver import build_decontam_grams

    docs = load(spark, sf_dir, "documents")
    # one materialization (r12): grams feeds the train and eval sides,
    # re-running the tokenize->5-gram->hash derivation twice without it
    grams = build_decontam_grams(docs).localCheckpoint(eager=False)
    train = grams.filter(F.col("source") != EVAL_SOURCE).select("gh").distinct()
    ev = grams.filter(F.col("source") == EVAL_SOURCE).select("doc_id", "gh")
    hit = F.sum(F.when(F.col("t_gh").isNotNull(), 1).otherwise(0)).cast("bigint")
    return (
        ev.join(train.select(F.col("gh").alias("t_gh")), ev.gh == F.col("t_gh"), "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            hit.alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_hit",
            (
                F.floor(F.col("n_hit").cast("double") / F.col("n_ngrams") * 1e6 + 0.5)
                / 1e6
            ).alias("containment"),
        )
    )


# Bloom membership screen: k hash rows over an m-bit space. At the
# corpus sizes here (tens of thousands of train n-grams) m = 2^20
# bits holds the false-positive rate near (1-e^(-kn/m))^k ~ 0.2%;
# production sizes m to the train-set cardinality the same way.
BLOOM_K = 4
BLOOM_M_BITS = 1 << 20


def _bloom_oracle() -> str:
    from ..operators.sketches import cm_bucket_sql

    def bucket(salt: int) -> str:
        return cm_bucket_sql("CAST(gh AS VARCHAR)", salt, BLOOM_M_BITS)

    bit_selects = "\n      UNION ALL\n".join(
        f"      SELECT {bucket(i)} AS bit FROM train" for i in range(BLOOM_K)
    )
    probe_selects = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, gh, {bucket(i)} AS bit FROM ev"
        for i in range(BLOOM_K)
    )
    return f"""
    WITH toks AS ({_TOKS_SRC_SQL}),
    ng AS (
      SELECT doc_id, source,
             list_distinct([{_NGRAM5_TERM}
                            for i in range(1, len(tokens) - {DECONTAM_N - 2})]) AS grams
      FROM toks WHERE len(tokens) >= {DECONTAM_N}
    ),
    g AS (
      SELECT doc_id, source, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
      FROM (SELECT doc_id, source, UNNEST(grams) AS gram FROM ng)
    ),
    train AS (SELECT DISTINCT gh FROM g WHERE source <> '{EVAL_SOURCE}'),
    bits AS (
      SELECT DISTINCT bit FROM (
{bit_selects}
      )
    ),
    ev AS (SELECT DISTINCT doc_id, gh FROM g WHERE source = '{EVAL_SOURCE}'),
    probes AS (
{probe_selects}
    ),
    hit AS (
      SELECT p.doc_id, p.gh, COUNT(b.bit) AS nb
      FROM probes p LEFT JOIN bits b ON b.bit = p.bit
      GROUP BY p.doc_id, p.gh
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN nb = {BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_hit
    FROM hit GROUP BY doc_id
    """


@register(
    "bloom_decontamination",
    oracle=_bloom_oracle(),
    doc=f"Bloom-filter decontamination screen: the constant-size "
    f"membership path `decontamination_ngram`'s docstring names. The "
    f"train split's distinct {DECONTAM_N}-gram hashes build a "
    f"k={BLOOM_K}, m=2^20-bit Bloom filter (operators/sketches.py "
    "bloom_build — a Count-Min sketch with 1-bit cells), and each "
    "eval document reports how many of its distinct n-grams the "
    "filter flags. No false negatives by construction (every exact "
    "hit is flagged — pinned against the exact join in "
    "tests/test_operators.py); false positives are deterministic "
    "md5-collision artifacts both engines share bit-for-bit, so the "
    "approximate answer itself value-hash-checks. Scale shape: the "
    "filter is O(m) bits regardless of train cardinality — it "
    "broadcasts where the exact train n-gram relation (the "
    "decontamination join's build side) would need a shuffle join; "
    "probing is map-only against the broadcast bit set.",
)
def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.sketches import bloom_build, bloom_probe_hits
    from ..silver import ensure_silver

    # read the MATERIALIZED silver decontam_grams relation instead of
    # re-deriving hashed 5-grams from raw text (same reroute as the
    # setjoin family, VERDICT r8 mandate #3); the DuckDB oracle still
    # derives from raw text, so every run re-proves the silver
    # derivation. Both probe sides are DISTINCT'd below, which absorbs
    # the duplicate rows a crashed incremental silver append can leave.
    root = ensure_silver(spark, sf_dir)
    grams = spark.read.parquet(os.path.join(root, "decontam_grams"))
    # no .distinct() on the train side (r13): bloom_build's own set-bit
    # distinct already dedups — the same filter bits come out whether
    # gh rows repeat or not, so the pre-distinct was a pure extra
    # shuffle of the train gram relation
    train = grams.filter(F.col("source") != EVAL_SOURCE).select("gh")
    bits = bloom_build(train, F.col("gh").cast("string"), BLOOM_K, BLOOM_M_BITS)
    ev = grams.filter(F.col("source") == EVAL_SOURCE).select("doc_id", "gh").distinct()
    # assume_distinct_probes: ev is DISTINCT'd above, so the probe
    # runs map-only against the dense bitset (one vectorized Arrow
    # membership test per row — r13; no joins, no broadcast builds)
    hits = bloom_probe_hits(
        ev,
        F.col("gh").cast("string"),
        bits,
        BLOOM_K,
        BLOOM_M_BITS,
        assume_distinct_probes=True,
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_hit"),
    )


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      {_minhash_oracle()}
    ),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION ALL
      SELECT b_id AS u, a_id AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u FROM edges),
    reach(src, dst) AS (
      SELECT u, u FROM nodes
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    )
    SELECT src AS doc_id,
           MIN(dst) AS component,
           (MIN(dst) = src) AS is_representative
    FROM reach GROUP BY src
    """,
    doc="Duplicate-cluster assignment: connected components over the "
    "MinHash near-dup pair graph (operators.graph, iterative min-label "
    "propagation — converges in <= diameter rounds, each round one "
    "node-keyed join + map-side-combined min agg over the pair-node "
    "relation only, never the corpus). The minimum doc_id of each "
    "component is the canonical document to keep; everything else is "
    "the drop set. Oracle: exact transitive closure via WITH RECURSIVE "
    "over the identical pair relation — an iterative graph algorithm "
    "with a full value-hash oracle.",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    # silver-backed pair source (VERDICT r7 mandate #3): identical
    # output to minhash_lsh_dedup, but the shingle/band chain comes
    # from the materialized silver relations instead of being
    # re-derived from raw text (5.5x on the pair stage, SCALE.md 6j-pre)
    pairs = minhash_lsh_dedup_silver(spark, sf_dir)
    comp = connected_components(pairs, src="a_id", dst="b_id")
    return comp.select(
        F.col("id").alias("doc_id"),
        "component",
        (F.col("component") == F.col("id")).alias("is_representative"),
    )


@register(
    "dedup_survivors",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      {_minhash_oracle()}
    ),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION ALL
      SELECT b_id AS u, a_id AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u FROM edges),
    reach(src, dst) AS (
      SELECT u, u FROM nodes
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ),
    comp AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src),
    members AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component,
             CAST(d.n_chars AS BIGINT) AS n_chars
      FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    surv AS (
      SELECT component,
             arg_max(doc_id, n_chars * 1000000000000
                             + (1000000000000 - doc_id)) AS survivor
      FROM members GROUP BY component
    )
    SELECT m.doc_id, m.component, (m.doc_id = s.survivor) AS keep
    FROM members m JOIN surv s USING (component)
    """,
    doc="Near-dup survivor selection — the step AFTER clustering that "
    "produces the cleaned corpus: every document joins its MinHash "
    "duplicate cluster (connected components over the LSH pair graph; "
    "docs in no pair are singleton clusters) and the cluster keeps its "
    "HIGHEST-QUALITY member (longest by n_chars, smallest doc_id on "
    "ties) rather than dedup_components' arbitrary min-id. Output is "
    "one row per doc with a keep flag. Scale shape: label propagation "
    "runs on the pair-node relation only; the corpus joins in once, "
    "broadcast components, one survivor argmax per cluster. The argmax "
    "tiebreak folds (n_chars, -doc_id) into one BIGINT on BOTH engines "
    "(valid: doc_id < 1e12 and n_chars * 1e12 < 2^63 at any test SF).",
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import survivor_fold_expr
    from ..operators.graph import connected_components

    docs = load(spark, sf_dir, "documents")
    # silver-backed pair source — see dedup_components
    pairs = minhash_lsh_dedup_silver(spark, sf_dir)
    comp = connected_components(pairs, src="a_id", dst="b_id").select(
        F.col("id").alias("doc_id"), "component"
    )
    members = (
        docs.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
            "n_chars",
        )
    )
    fold = survivor_fold_expr(F.col("n_chars"), F.col("doc_id"))
    surv = members.groupBy("component").agg(
        F.max_by("doc_id", fold).alias("survivor")
    )
    return members.join(F.broadcast(surv), "component").select(
        "doc_id", "component", (F.col("doc_id") == F.col("survivor")).alias("keep")
    )


#: repeated-span detection granularity (tokens per window) — the
#: "~50-token duplicate span" idea of Lee et al. 2022 at a test-corpus
#: scale where 8-token spans actually repeat
SPAN_N = 8


def span_occurrences(toks: DataFrame, span_n: int = SPAN_N) -> DataFrame:
    """(doc_id, i, gh) — one row per ``span_n``-token window position,
    gh = the 60-bit hash of the window text. ONE definition shared by
    the two batch span queries and the maintained span index
    (streaming/span_index.py), so stream == batch holds by shared
    code. Precondition: ``toks`` is (doc_id, tokens) already filtered
    to size(tokens) >= span_n (kept outside so each caller's plan is
    unchanged)."""
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(tokens) - {span_n - 1}), i ->"
                f" struct(i AS i, array_join(slice(tokens, i, {span_n}), ' ')"
                " AS gram))"
            )
        ).alias("o"),
    ).select(
        "doc_id",
        F.col("o.i").alias("i"),
        md5_hash60_expr(F.col("o.gram")).alias("gh"),
    )


@register(
    "repeated_span_fraction",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    occ AS (
      SELECT doc_id, t.i AS i,
             ('0x' || substr(md5(array_to_string(tokens[t.i:t.i + {SPAN_N - 1}],
                                                 ' ')), 1, 15))::BIGINT AS gh
      FROM toks, UNNEST(range(1, len(tokens) - {SPAN_N - 2})) AS t(i)
      WHERE len(tokens) >= {SPAN_N}
    ),
    dup AS (
      SELECT gh FROM occ GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    covered AS (
      SELECT DISTINCT o.doc_id, p.pos
      FROM occ o JOIN dup USING (gh),
           UNNEST(range(o.i, o.i + {SPAN_N})) AS p(pos)
    ),
    perdoc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_tokens
      FROM covered GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.tokens) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
           CAST(COALESCE(p.n_dup_tokens, 0) * 1000000
                // len(t.tokens) AS BIGINT) AS dup_ppm
    FROM toks t LEFT JOIN perdoc p USING (doc_id)
    WHERE len(t.tokens) >= {SPAN_N}
    """,
    doc="Substring-level duplication metric (Lee et al. 2022, "
    "'Deduplicating Training Data Makes Language Models Better'): for "
    f"every document, the fraction of token positions covered by a "
    f"{SPAN_N}-token span that also appears in ANOTHER document — the "
    "signal substring-level dedup cuts on, complementing doc-level "
    "MinHash (a doc can be 30% boilerplate yet no near-dup of "
    "anything). Shape: hashed span occurrences are one map-side "
    "projection off the token arrays (no self-join); cross-doc spans "
    "come from one span-keyed agg; coverage is a bounded x8 position "
    "explode + DISTINCT — corpus-linear throughout, the suffix-array "
    "equivalent for a fixed window size.",
)
def repeated_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # toks feeds occ + the final join, occ feeds the dup agg + the
    # coverage join — and `dup` is broadcast, so no exchange reuse can
    # kick in: without materialization the tokenize pass runs 3x and
    # the span-hash (md5-per-window) pass 2x (r12 plan audit: 3 scans,
    # 2 Generate+md5 subtrees). One lazy localCheckpoint each = one
    # materialization, the `ranked` pattern from the setjoin family.
    toks = docs.select(
        "doc_id", tokens_expr(F.col("text")).alias("tokens")
    ).filter(F.size("tokens") >= SPAN_N).localCheckpoint(eager=False)
    occ = span_occurrences(toks).localCheckpoint(eager=False)
    dup = (
        occ.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    covered = (
        occ.join(dup, "gh")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(i, i + {SPAN_N - 1})")).alias("pos"),
        )
        .distinct()
    )
    perdoc = covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_tokens")
    )
    return (
        toks.join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            F.size("tokens").cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("n_dup_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_dup_tokens"),
            F.expr(
                "CAST(COALESCE(n_dup_tokens, 0) * 1000000"
                " DIV size(tokens) AS BIGINT)"
            ).alias("dup_ppm"),
        )
    )


#: total-order key for "first occurrence" of a span across the corpus:
#: (doc_id, i) folded into one BIGINT (DuckDB arg_min cannot order by a
#: struct). Safe while token position < 1e9 (any real document) and
#: doc_id < ~9.2e9 (BIGINT headroom); at larger id spaces widen to a
#: two-column min via window functions.
_OCC_KEY_BASE = 1_000_000_000


@register(
    "substring_dedup_rewrite",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                         ' '), x -> x <> '') AS tokens
      FROM documents WHERE text IS NOT NULL
    ),
    occ AS (
      SELECT doc_id, t.i AS i,
             ('0x' || substr(md5(array_to_string(tokens[t.i:t.i + {SPAN_N - 1}],
                                                 ' ')), 1, 15))::BIGINT AS gh
      FROM toks, UNNEST(range(1, len(tokens) - {SPAN_N - 2})) AS t(i)
      WHERE len(tokens) >= {SPAN_N}
    ),
    firsts AS (
      SELECT gh, MIN(doc_id * {_OCC_KEY_BASE} + i) AS fk FROM occ GROUP BY gh
    ),
    dupocc AS (
      SELECT o.doc_id, o.i
      FROM occ o JOIN firsts f USING (gh)
      WHERE o.doc_id * {_OCC_KEY_BASE} + o.i <> f.fk
    ),
    covered AS (
      SELECT DISTINCT d.doc_id, p.pos
      FROM dupocc d, UNNEST(range(d.i, d.i + {SPAN_N})) AS p(pos)
    ),
    poss AS (
      SELECT t.doc_id, p.i AS pos, t.tokens[p.i] AS tok
      FROM toks t, UNNEST(range(1, len(t.tokens) + 1)) AS p(i)
    ),
    kept AS (
      SELECT poss.doc_id, poss.pos, poss.tok
      FROM poss LEFT JOIN covered c
        ON c.doc_id = poss.doc_id AND c.pos = poss.pos
      WHERE c.pos IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_dedup
      FROM kept GROUP BY doc_id
    ),
    ncov AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed
      FROM covered GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.tokens) AS BIGINT) AS n_tokens,
           COALESCE(n.n_removed, CAST(0 AS BIGINT)) AS n_removed,
           COALESCE(a.text_dedup, '') AS text_dedup
    FROM toks t LEFT JOIN ncov n USING (doc_id) LEFT JOIN agg a USING (doc_id)
    """,
    doc="Substring-dedup REMEDIATION (Lee et al. 2022 'Deduplicating "
    "Training Data Makes Language Models Better' — the rewrite, not "
    "just the repeated_span_fraction metric): every corpus position "
    f"covered by a {SPAN_N}-token span whose hash also occurs at an "
    "earlier (doc_id, position) is removed; the globally FIRST "
    "occurrence of each span survives, including self-repetition "
    "inside one document. Output = (doc_id, n_tokens, n_removed, "
    "text_dedup) over normalized token space — the emitted corpus a "
    "pretraining pipeline would feed downstream. Deterministic: "
    "first-occurrence is a MIN over the (doc_id, i) fold, so the "
    "result is replay- and partitioning-invariant. Scale shape: span "
    "hashing is the same map-only projection as the metric; the only "
    "corpus-sized shuffles are the span-keyed first-occurrence agg "
    "and the doc-keyed coverage union; the rewrite itself is an "
    "array filter INSIDE the scan (no per-token explode on the Spark "
    "side). Docs shorter than the window pass through unchanged.",
)
def substring_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # same one-materialization treatment as repeated_span_fraction:
    # toks feeds occ + the rewrite join, occ feeds firsts + dupocc
    toks = docs.select(
        "doc_id", tokens_expr(F.col("text")).alias("tokens")
    ).localCheckpoint(eager=False)
    spannable = toks.filter(F.size("tokens") >= SPAN_N)
    occ = span_occurrences(spannable).localCheckpoint(eager=False)
    okey = F.col("doc_id") * F.lit(_OCC_KEY_BASE) + F.col("i")
    firsts = occ.groupBy("gh").agg(F.min(okey).alias("fk"))
    dupocc = occ.join(firsts, "gh").filter(okey != F.col("fk"))
    covered = (
        dupocc.select(
            "doc_id",
            F.explode(F.expr(f"sequence(i, i + {SPAN_N - 1})")).alias("pos"),
        )
        .distinct()
    )
    cov_arr = covered.groupBy("doc_id").agg(F.collect_set("pos").alias("cov"))
    return (
        toks.join(cov_arr, "doc_id", "left")
        .withColumn("cov", F.coalesce(F.col("cov"), F.expr("array()")))
        .select(
            "doc_id",
            F.size("tokens").cast("bigint").alias("n_tokens"),
            F.size("cov").cast("bigint").alias("n_removed"),
            F.array_join(
                F.expr("filter(tokens, (t, idx) -> NOT array_contains(cov, idx + 1))"),
                " ",
            ).alias("text_dedup"),
        )
    )


@register(
    "decontamination_ngram_silver",
    oracle=_DECONTAM_ORACLE,  # one derivation, one mirror
    doc="Train/eval decontamination reading the MATERIALIZED silver "
    "decontam_grams relation (silver.ensure_silver) instead of "
    "re-deriving hashed 5-grams from raw text — the third silver "
    "consumer, same output and oracle as decontamination_ngram by "
    "construction (one derivation: silver.build_decontam_grams). Both "
    "probe sides are DISTINCT'd, which also absorbs the duplicate gram "
    "rows a crashed incremental silver append can leave (the relation "
    "is written before the doc_shingles commit point).",
)
def decontamination_ngram_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..silver import ensure_silver

    root = ensure_silver(spark, sf_dir)
    grams = spark.read.parquet(os.path.join(root, "decontam_grams"))
    train = grams.filter(F.col("source") != EVAL_SOURCE).select("gh").distinct()
    # The eval-side DISTINCT on (doc_id, gh) would also collapse a
    # WITHIN-doc 60-bit md5 collision the re-deriving twin counts as
    # two rows (ADVICE r7) — adjudicated acceptable at ~2^-60 odds per
    # doc; revisit via a (doc_id, gram-position) write-time identity
    # key if the relation ever needs exact multiplicity
    ev = grams.filter(F.col("source") == EVAL_SOURCE).select("doc_id", "gh").distinct()
    hit = F.sum(F.when(F.col("t_gh").isNotNull(), 1).otherwise(0)).cast("bigint")
    return (
        ev.join(train.select(F.col("gh").alias("t_gh")), ev.gh == F.col("t_gh"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            hit.alias("n_hit"),
            (
                F.floor(
                    hit.cast("double") / F.count(F.lit(1)) * F.lit(1e6) + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("containment"),
        )
    )


def _fuzzy_decontam_oracle() -> str:
    """MinHash band CTEs (shared geometry with _minhash_oracle) with the
    candidate join restricted to train-vs-eval pairs."""
    sig_cols = ",\n             ".join(
        f"list_min(list_transform(h, x -> ({a} * (x % {MINHASH_P}) + {b}) % {MINHASH_P}))"
        f" AS sig_{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    )
    band_selects = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(
            f"sig_{b * ROWS_PER_BAND + r}::VARCHAR" for r in range(ROWS_PER_BAND)
        )
        + " AS band_key FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
    WITH toks AS ({_TOKS_SQL}),
    sh AS ({_SH_SQL}),
    hs AS (
      SELECT doc_id,
             list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
             {sig_cols}
      FROM hs
    ),
    bands AS (
{band_selects}
    ),
    lab AS (SELECT doc_id, source FROM documents),
    ev AS (
      SELECT b.doc_id, b.band, b.band_key FROM bands b
      JOIN lab USING (doc_id) WHERE source = '{EVAL_SOURCE}'
    ),
    tr AS (
      SELECT b.doc_id, b.band, b.band_key FROM bands b
      JOIN lab USING (doc_id) WHERE source <> '{EVAL_SOURCE}'
    ),
    cand AS (
      SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
      FROM tr t JOIN ev e ON t.band = e.band AND t.band_key = e.band_key
    )
    SELECT c.train_id, c.eval_id,
           len(list_intersect(st.shingles, se.shingles)) AS inter,
           ROUND(CAST(len(list_intersect(st.shingles, se.shingles)) AS DOUBLE)
                 / (len(st.shingles) + len(se.shingles)
                    - len(list_intersect(st.shingles, se.shingles))), 6) AS jaccard
    FROM cand c
    JOIN sh st ON st.doc_id = c.train_id
    JOIN sh se ON se.doc_id = c.eval_id
    WHERE ROUND(CAST(len(list_intersect(st.shingles, se.shingles)) AS DOUBLE)
          / (len(st.shingles) + len(se.shingles)
             - len(list_intersect(st.shingles, se.shingles))), 6) >= {JACCARD_MIN}
    """


@register(
    "fuzzy_decontamination",
    oracle=_fuzzy_decontam_oracle(),
    doc="FUZZY train/eval decontamination via MinHash+LSH (the "
    "near-duplicate complement of the exact-n-gram containment "
    f"decontamination): training docs (source != '{EVAL_SOURCE}') "
    "colliding with a held-out eval doc in >= 1 LSH band, verified by "
    f"exact shingle Jaccard >= {JACCARD_MIN} — catches paraphrased or "
    "lightly-edited eval leakage that exact n-gram probes miss "
    "(GPT-3's dedup appendix and the Pile both ship this op). Reads "
    "the MATERIALIZED silver band/shingle relations; the eval id set "
    "is tiny (held-out benchmarks) and broadcasts, so the probe is "
    "one band-keyed join against eval bands only — never a train-train "
    "pair explosion. Output = (train_id, eval_id, inter, jaccard): "
    "the contaminated-doc drop list with its evidence.",
)
def fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..silver import ensure_silver

    root = ensure_silver(spark, sf_dir)
    sh = spark.read.parquet(os.path.join(root, "doc_shingles"))
    bands = spark.read.parquet(os.path.join(root, "minhash_bands"))
    eval_ids = (
        load(spark, sf_dir, "documents")
        .filter(F.col("source") == EVAL_SOURCE)
        .select("doc_id")
    )
    ev_bands = bands.join(F.broadcast(eval_ids), "doc_id").select(
        F.col("doc_id").alias("eval_id"), "band", "band_key"
    )
    tr_bands = bands.join(F.broadcast(eval_ids), "doc_id", "left_anti").select(
        F.col("doc_id").alias("train_id"), "band", "band_key"
    )
    cand = (
        tr_bands.join(F.broadcast(ev_bands), ["band", "band_key"])
        .select("train_id", "eval_id")
        .distinct()
    )
    st = sh.select(F.col("doc_id").alias("train_id"), F.col("shingles").alias("t_sh"))
    se = sh.select(F.col("doc_id").alias("eval_id"), F.col("shingles").alias("e_sh"))
    inter = F.size(F.array_intersect("t_sh", "e_sh"))
    jac = inter.cast("double") / (F.size("t_sh") + F.size("e_sh") - inter)
    return (
        cand.join(st, "train_id")
        .join(se, "eval_id")
        .select(
            "train_id",
            "eval_id",
            inter.alias("inter"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_MIN)
    )


#: ground-truth threshold for the LSH acceptance eval: recall is
#: measured where banding SHOULD be near-perfect (tau=0.5 -> band
#: collision probability 1-(1-0.5^r)^b is high), which is exactly the
#: region a production dedup run cares about missing
LSH_EVAL_TAU = 0.5
#: LSH_EVAL_TAU as an exact rational for the oracle's integer filter
#: (same discipline as pipeline_setjoin._t_frac; Fraction(str(t))
#: recovers the decimal the literal denotes, not its binary neighbor)
from fractions import Fraction as _Fr  # noqa: E402

_TAU_NUM = _Fr(str(LSH_EVAL_TAU)).numerator
_TAU_DEN = _Fr(str(LSH_EVAL_TAU)).denominator


def _lsh_recall_oracle() -> str:
    # the truth side is the setjoin oracle's full-inverted-index plan
    # PARAMETERIZED at LSH_EVAL_TAU (not the registered oracle string,
    # which bakes SETJOIN_THRESHOLD — code-review r9b: the two
    # constants coincide today but must not be silently coupled)
    from .pipeline_setjoin import _SETJOIN_EX_SQL

    exact_sql = f"""
    WITH {_SETJOIN_EX_SQL},
    sized AS (
      SELECT doc_id, token,
             COUNT(*) OVER (PARTITION BY doc_id) AS n
      FROM ex
    ),
    pair_inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             a.n AS a_n, b.n AS b_n, COUNT(*) AS inter
      FROM sized a JOIN sized b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.n, b.n
    )
    SELECT a_id, b_id FROM pair_inter
    WHERE inter * {_TAU_DEN} >= (a_n + b_n - inter) * {_TAU_NUM}
    """
    return f"""
    WITH lsh AS (SELECT a_id, b_id FROM ({_minhash_oracle()})),
    exact AS (SELECT a_id, b_id FROM ({exact_sql})),
    hit AS (
      SELECT e.a_id FROM exact e JOIN lsh l
        ON l.a_id = e.a_id AND l.b_id = e.b_id
    )
    SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT COUNT(*) FROM lsh) AS BIGINT) AS n_lsh_pairs,
           CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_found,
           CAST(FLOOR(1000000.0 * (SELECT COUNT(*) FROM hit)
                      / GREATEST((SELECT COUNT(*) FROM exact), 1) + 0.5)
                AS BIGINT) AS recall_ppm
    """


@register(
    "lsh_dedup_recall_eval",
    oracle=_lsh_recall_oracle(),
    doc=f"Acceptance eval for the approximate dedup path (the dedup "
    "analogue of ann_recall_eval): recall of MinHash+LSH banding "
    f"against the EXACT Jaccard >= {LSH_EVAL_TAU} pair set computed "
    "by the lossless prefix join — the number a data team checks "
    "before trusting banded dedup on a new corpus (band geometry "
    "tuned for one shingle distribution can silently under-recall on "
    "another). Truth side: the lossless prefix join's verified pair "
    "set, persisted as a content-keyed artifact (ensure_exact_pairs, "
    "keyed by corpus digest + tau + derivation versions) — computed "
    "once per corpus and READ on later runs; operating side: "
    "minhash_lsh_dedup's verified pairs. A pair is found iff banding "
    "surfaced it as a candidate AND exact verification kept it, so "
    "recall isolates BAND MISSES — the only loss channel. The eval "
    "itself adds one pair-keyed join and three counts on pair-sized "
    "relations. Output: one row (n_exact, n_lsh_pairs, n_found, "
    "recall_ppm).",
)
def lsh_dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline_setjoin import ensure_exact_pairs

    # Truth side: the content-keyed persisted pair relation (VERDICT
    # r9 mandate #3) — computed by the lossless prefix join once per
    # (corpus, tau) and read as parquet on every later run, so the
    # eval no longer re-prices the whole exact join each bench pass.
    # A parquet read is cheap for both consumers (count + hit join);
    # no checkpoint needed.
    exact = ensure_exact_pairs(spark, sf_dir, LSH_EVAL_TAU).select(
        "a_id", "b_id"
    )
    # the silver-reading twin: identical pairs by construction (one
    # derivation in silver.build_silver_relations), no raw-text rescan
    lsh = (
        minhash_lsh_dedup_silver(spark, sf_dir)
        .select("a_id", "b_id")
        .localCheckpoint(eager=False)
    )
    hit = exact.join(lsh, ["a_id", "b_id"])
    n_exact = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    n_lsh = lsh.agg(F.count(F.lit(1)).cast("bigint").alias("n_lsh_pairs"))
    n_found = hit.agg(F.count(F.lit(1)).cast("bigint").alias("n_found"))
    return (
        n_exact.crossJoin(n_lsh)
        .crossJoin(n_found)
        .select(
            "n_exact",
            "n_lsh_pairs",
            "n_found",
            F.floor(
                F.lit(1000000.0)
                * F.col("n_found")
                / F.greatest(F.col("n_exact"), F.lit(1))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("recall_ppm"),
        )
    )
