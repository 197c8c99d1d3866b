"""LSH-bucketed approximate nearest-neighbor search over embeddings.

Scale path for ``ann_topk_cosine`` (the brute-force baseline in
``queries.pipeline_similarity``): random-hyperplane LSH assigns every
vector a small integer bucket; the query-to-candidate join is an
equi-join on the bucket id instead of a full cross product. At 100 TB:

- bucket assignment is a projection (map-only, codegen'd fold over the
  array column) — no shuffle;
- the candidate join shuffles on ``bucket`` — with 2^n_planes buckets
  the expected bucket population is N / 2^n, tunable to executor
  memory; skewed buckets (dense regions) split with AQE skew-join;
- per-query top-k is a bounded window inside each bucket — never a
  global sort.

Recall is the standard SRP-LSH trade: vectors whose cosine similarity
is high share all n sign-bits with probability (1 - θ/π)^n. Multiple
independent tables (OR-amplification) raise recall; the operator takes
``n_planes`` and callers union tables if needed.

The hyperplanes are **deterministic literal constants** (fixed LCG,
seed in-source) embedded into both the Spark plan and the DuckDB
oracle SQL — same floats, same sequential-fold dot product, same signs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

EMBEDDING_DIM = 64
N_PLANES = 4  # 16 buckets; at sf0.01 (500 vecs) ~31 candidates/bucket


def _lcg_floats(seed: int, n: int) -> list[float]:
    """Deterministic pseudo-random floats in [-1, 1), 6 dp — literal
    constants, identical on both engines (no runtime RNG)."""
    x = seed & ((1 << 64) - 1)
    out = []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(round((x >> 33) / float(1 << 31) - 1.0, 6))
    return out


HYPERPLANES: list[list[float]] = [
    _lcg_floats(42 + 1000 * j, EMBEDDING_DIM) for j in range(N_PLANES)
]


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-order double fold — matches DuckDB list_dot_product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def plane_literal(j: int) -> Column:
    return F.array(*[F.lit(c) for c in HYPERPLANES[j]])


def bucket_expr(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Sign-bit bucket id: bit j set iff dot(vec, plane_j) >= 0."""
    bucket = None
    for j in range(n_planes):
        bit = (
            F.when(dot_expr(vec, plane_literal(j)) >= 0, F.lit(1 << j))
            .otherwise(F.lit(0))
            .cast("int")
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket


def with_bucket(df: DataFrame, vec_col: str = "embedding", out: str = "bucket") -> DataFrame:
    return df.withColumn(out, bucket_expr(F.col(vec_col)))


def bucket_sql_exprs(vec_sql: str, n_planes: int = N_PLANES) -> str:
    """The identical bucket computation in DuckDB SQL (oracle side)."""
    bits = []
    for j in range(n_planes):
        plane = "[" + ", ".join(repr(c) for c in HYPERPLANES[j]) + "]::DOUBLE[]"
        bits.append(
            f"(CASE WHEN list_dot_product({vec_sql}, {plane}) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(bits)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

N_CENTROIDS = 16
N_PROBE = 4


def ivf_assign(
    emb: DataFrame, centroids: DataFrame, rank_limit: int, id_col: str = "vec_id"
) -> DataFrame:
    """Rank centroids per vector by cosine and keep the top
    ``rank_limit`` (1 for list assignment, N_PROBE for query probing).
    A real deployment trains centroids with k-means; here they are a
    deterministic sample (first N_CENTROIDS vectors), which changes
    recall, not the plumbing.

    ``rank_limit == 1`` (the whole-corpus assignment pass) is genuinely
    map-only: the centroid set broadcasts as ONE array row and the
    argmax runs as an array fold inside the scan — no exchange of the
    corpus at any size. The window formulation would shuffle+sort the
    entire corpus on ``id_col`` just to pick each row's max. The
    general path (used for the tiny query-probe set) keeps the
    explode + per-vector window.

    Contract: ``emb`` has (id_col, ev, en) — vector + norm; ``centroids``
    has (centroid_id, cv, cn)."""
    if rank_limit == 1:
        cent_arr = centroids.agg(
            F.collect_list(F.struct("centroid_id", "cv", "cn")).alias("cents")
        )
        # struct-ordered max: (sim, -centroid_id) — highest sim wins,
        # ties prefer the smallest centroid id, matching the window
        # path's ORDER BY sim DESC, centroid_id
        best = F.array_max(
            F.transform(
                "cents",
                lambda c: F.struct(
                    (dot_expr(F.col("ev"), c["cv"]) / (F.col("en") * c["cn"])).alias(
                        "sim"
                    ),
                    (-c["centroid_id"]).alias("neg_id"),
                ),
            )
        )
        return (
            emb.crossJoin(F.broadcast(cent_arr))
            .withColumn("best", best)
            .select(
                id_col,
                "ev",
                "en",
                (-F.col("best.neg_id")).alias("centroid_id"),
                F.col("best.sim").alias("sim"),
                F.lit(1).alias("crank"),
            )
        )
    sim = dot_expr(F.col("ev"), F.col("cv")) / (F.col("en") * F.col("cn"))
    w = W.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        emb.crossJoin(F.broadcast(centroids))
        .select(id_col, "ev", "en", "centroid_id", sim.alias("sim"))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= rank_limit)
    )


# ---------------------------------------------------------------------------
# Exact blocked-GEMM cosine similarity join
# ---------------------------------------------------------------------------

#: Block count for the blocked all-pairs join at test scale (sf0.01:
#: 500 vecs -> 63/block; sf0.1: 2000 -> 250/block; 36 block-pairs).
N_SIM_BLOCKS = 8


def blocked_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    n_blocks: int = N_SIM_BLOCKS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Exact all-pairs cosine join via block-partitioned matrix products.

    Semantics: identical to the theta-join baseline — every unordered
    pair (a, b), a_id < b_id, with ``round(cos(a, b), 4) >= threshold``.
    Output columns: (a_id, b_id, a_label, b_label, sim).

    Why not LSH banding: at this corpus's threshold (0.40 = a 3.2-sigma
    tail of the random-pair sim distribution; SCALE.md 6n) the
    sign-agreement probability for a qualifying pair is only
    p1 = 1 - acos(0.40)/pi = 0.631 vs p0 = 0.5 for a random pair, so
    any banding with negligible miss probability admits nearly every
    pair as a candidate — banding is only honest at tau >= ~0.8.  An
    exact threshold join this deep in the tail is inherently
    Omega(n^2 d) flops; the scalable form is to make the n^2
    DISTRIBUTE evenly and run each tile at BLAS speed instead of as a
    per-row Catalyst fold inside a BroadcastNestedLoopJoin.

    Plan shape (scale story):
    - block id = vec_id % n_blocks (hash-even, zero skew);
    - the (bi <= bj) block-pair table is tiny and broadcast — each side
      of the cogroup replicates a row once per participating pair
      (~(n_blocks+1)/2 copies), so total shuffle volume is
      n * (n_blocks+1) * d * 8 bytes, spread uniformly;
    - each cogroup task is ONE numpy GEMM over a (rows_a x d) x
      (d x rows_b) tile plus a threshold scan — O(rows^2 d) flops at
      hardware speed, emitting only qualifying pairs;
    - at 100 TB, pick n_blocks so a tile fits a task (e.g. 20k rows x
      1k dims = 160 MB/side); n^2 tile count is the irreducible cost
      of an exact 3-sigma join — real pipelines either raise tau into
      the LSH-honest regime or accept IVF-restricted (lossy) pairing.

    Float note: the GEMM accumulates in a different order than the
    sequential fold of the baseline/oracle; divergence is ~1e-16
    relative, only observable if a sim lands within 1e-12 of a 4-dp
    rounding boundary or of the threshold (tests pin equality).
    """
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    pairs = [
        (i * n_blocks + j, i, j)
        for i in range(n_blocks)
        for j in range(i, n_blocks)
    ]
    pairs_df = spark.createDataFrame(pairs, "pid INT, bi INT, bj INT")
    v = emb.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lbl"),
        F.col(vec_col).alias("vec"),
        # pmod, not %: a negative id under % would land in a negative
        # block no pair row references — silently dropped rows
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    def side(tag: str, pair_key: str) -> DataFrame:
        # distinct aliases per side: left and right share lineage, and
        # cogrouping two un-aliased copies trips the ambiguous-self-join
        # analyzer check
        vv = v.alias(f"v_{tag}")
        pp = pairs_df.alias(f"p_{tag}")
        return vv.join(
            F.broadcast(pp), F.col(f"v_{tag}.blk") == F.col(f"p_{tag}.{pair_key}")
        ).select(
            F.col(f"p_{tag}.pid").alias("pid"),
            F.col(f"v_{tag}.vid").alias("vid"),
            F.col(f"v_{tag}.lbl").alias("lbl"),
            F.col(f"v_{tag}.vec").alias("vec"),
            F.col(f"v_{tag}.blk").alias("blk"),
        )

    left = side("l", "bi")
    right = side("r", "bj")

    def tile(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a_id": pd.Series(dtype="int64"),
                "b_id": pd.Series(dtype="int64"),
                "a_label": pd.Series(dtype="int32"),
                "b_label": pd.Series(dtype="int32"),
                "sim": pd.Series(dtype="float64"),
            }
        )
        if l.empty or r.empty:
            return empty
        A = np.vstack(l["vec"].to_numpy()).astype(np.float64)
        B = np.vstack(r["vec"].to_numpy()).astype(np.float64)
        na = np.sqrt((A * A).sum(axis=1))
        nb = np.sqrt((B * B).sum(axis=1))
        # floor(x*1e4 + 0.5)/1e4, NOT np.round: np.round is
        # half-to-even while the Spark baseline and DuckDB oracle use
        # the repo-wide FLOOR(x*scale + 0.5) idiom — identical IEEE
        # ops on all three engines, so rounding is not a divergence
        # channel (r8 ADVICE; only GEMM accumulation order remains)
        sims = np.floor((A @ B.T) / np.outer(na, nb) * 1e4 + 0.5) / 1e4
        ia, ib = np.nonzero(sims >= threshold)
        if ia.size == 0:
            return empty
        aid = l["vid"].to_numpy()[ia]
        bid = r["vid"].to_numpy()[ib]
        la = l["lbl"].to_numpy()[ia]
        lb = r["lbl"].to_numpy()[ib]
        s = sims[ia, ib]
        if l["blk"].iat[0] == r["blk"].iat[0]:
            # diagonal tile: both orientations present — keep the
            # strict upper triangle
            keep = aid < bid
            aid, bid, la, lb, s = aid[keep], bid[keep], la[keep], lb[keep], s[keep]
        else:
            # off-diagonal tile: each unordered pair appears exactly
            # once — normalize orientation to a_id < b_id
            swap = aid > bid
            aid2 = np.where(swap, bid, aid)
            bid2 = np.where(swap, aid, bid)
            la2 = np.where(swap, lb, la)
            lb2 = np.where(swap, la, lb)
            aid, bid, la, lb = aid2, bid2, la2, lb2
        return pd.DataFrame(
            {"a_id": aid, "b_id": bid, "a_label": la, "b_label": lb, "sim": s}
        )

    return left.groupBy("pid").cogroup(right.groupBy("pid")).applyInPandas(
        tile,
        schema="a_id BIGINT, b_id BIGINT, a_label INT, b_label INT, sim DOUBLE",
    )


def gemm_topk_neighbors(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    n_blocks: int = N_SIM_BLOCKS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-``k`` neighbors for every probe against the
    full corpus: (query_id, neighbor_id, sim_i4) with sim quantized to
    integer ten-thousandths (FLOOR(x*1e4+0.5) — the repo-wide rounding
    idiom), ranked by (sim_i4 DESC, neighbor_id ASC), self-pairs
    (query_id == neighbor_id) excluded.

    Same scale design as blocked_cosine_pairs, specialized for the
    asymmetric probe-vs-corpus case: the corpus hash-partitions into
    ``n_blocks`` even tiles, the (small) probe side replicates to
    every tile, each cogroup task runs ONE numpy GEMM (probes x tile)
    and emits only its tile-local top-k per probe UNDER THE FINAL
    COMPARATOR — any global top-k element is necessarily in its
    tile's top-k, so the window merge over the n_blocks*k candidates
    per probe is exact. Shuffle volume: corpus once (block
    partitioning) + probes x n_blocks + the candidate relation
    (n_blocks * k rows per probe) — never an n_probes x n_corpus
    pairwise relation.

    Float note: identical adjudication to blocked_cosine_pairs — the
    GEMM accumulates in a different order than a sequential
    list_dot_product fold; divergence is ~1e-16 relative and
    observable only when an unrounded sim lands within ~1e-12 of a
    0.5e-4 quantization boundary."""
    spark = corpus.sparkSession
    blocks = spark.createDataFrame([(i,) for i in range(n_blocks)], "pid INT")
    c = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("pid"),
    )
    p = probes.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    ).crossJoin(F.broadcast(blocks))
    return gemm_topk_grouped(c, p, k)


def gemm_topk_grouped(c_keyed: DataFrame, p_keyed: DataFrame, k: int) -> DataFrame:
    """Shared grouped-tile GEMM top-k core: ``c_keyed`` (pid, vid, vec)
    and ``p_keyed`` (pid, qid, qvec) cogroup on pid; each task runs one
    numpy GEMM, quantizes sims to integer ten-thousandths, and emits
    its group-local top-k per probe under the FINAL comparator
    (sim_i4 DESC, vid ASC); the window merge over each probe's
    per-group candidates is exact because any global top-k element is
    in its group's top-k. Callers choose the grouping: hash blocks
    with probe replication (exhaustive kNN — gemm_topk_neighbors) or
    IVF cells with probes routed to their probed cells (candidate-
    restricted kNN — margin mining). Self-pairs (qid == vid) are
    excluded. A (qid, vid) pair must appear in at most one group, or
    the merge window would see duplicates (true for both callers:
    hash blocks partition vid; IVF assignment is rank-1)."""
    import numpy as np
    import pandas as pd

    def tile(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "sim_i4": pd.Series(dtype="int64"),
            }
        )
        if l.empty or r.empty:
            return empty
        C = np.vstack(l["vec"].to_numpy()).astype(np.float64)
        Q = np.vstack(r["qvec"].to_numpy()).astype(np.float64)
        cn = np.sqrt((C * C).sum(axis=1))
        qn = np.sqrt((Q * Q).sum(axis=1))
        # A zero-norm vector would make the division produce NaN, and
        # np.floor(NaN).astype(int64) is undefined (typically INT64_MIN,
        # whose negation in the lexsort key overflows and sorts the
        # garbage pair FIRST, evicting real neighbors). Fail loudly.
        if not (cn > 0).all():
            raise ValueError(
                "gemm_topk_grouped: zero-norm corpus vector(s) "
                f"vid={l['vid'].to_numpy()[cn == 0][:5].tolist()}"
            )
        if not (qn > 0).all():
            raise ValueError(
                "gemm_topk_grouped: zero-norm probe vector(s) "
                f"qid={r['qid'].to_numpy()[qn == 0][:5].tolist()}"
            )
        sims = np.floor((Q @ C.T) / np.outer(qn, cn) * 1e4 + 0.5).astype(np.int64)
        cvid = l["vid"].to_numpy()
        qvid = r["qid"].to_numpy()
        # exclude self-pairs by sinking them below any real sim.
        # Sentinel is INT64_MIN + 1, NOT INT64_MIN: the sort key below
        # negates the row, and -INT64_MIN overflows back to INT64_MIN
        # in numpy, which would sort the self-pair FIRST and let it
        # consume a top-k slot (the probe's home tile would then emit
        # only k-1 real candidates, breaking the exact-merge argument)
        sentinel = np.iinfo(np.int64).min + 1
        sims[qvid[:, None] == cvid[None, :]] = sentinel
        kk = min(k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for i in range(sims.shape[0]):
            row = sims[i]
            order = np.lexsort((cvid, -row))[:kk]
            keep = row[order] != sentinel
            out_q.append(np.full(int(keep.sum()), qvid[i], dtype=np.int64))
            out_n.append(cvid[order][keep])
            out_s.append(row[order][keep])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "sim_i4": np.concatenate(out_s),
            }
        )

    cands = (
        c_keyed.groupBy("pid")
        .cogroup(p_keyed.groupBy("pid"))
        .applyInPandas(
            tile, schema="query_id BIGINT, neighbor_id BIGINT, sim_i4 BIGINT"
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("sim_i4").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim_i4")
    )
