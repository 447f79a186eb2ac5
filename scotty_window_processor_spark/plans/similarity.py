"""Similarity search over an embedding column (array<float>).

Two paths:
- brute-force cosine top-k: broadcast the (small) query set, JVM-side dot
  product via F.zip_with/F.aggregate, rank with a window function. Exact;
  cost O(queries × corpus) — the correctness baseline and fine whenever
  the query side broadcasts.
- LSH-bucketed (random hyperplane signs): corpus and queries hash to
  signature buckets; only same-bucket pairs are scored. Sub-linear
  candidate generation — the 100 TB path; recall tunable via tables.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _cos6(a, b, na, nb):
    """Cosine rounded to 6 decimals BEFORE ranking/thresholding — the
    oracle-parity rule (robust to last-ulp summation noise). One
    definition shared by the brute-force baseline and every ANN path, so
    the tie-break/precision contract cannot drift between them."""
    return F.round(_dot(a, b) / (na * nb), 6)


def _rank_topk(scored, k):
    """Deterministic top-k per query: cos desc, neighbor_id tie-break."""
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
        ),
    )
    return ranked.where(F.col("rank") <= k).select("query_id", "neighbor_id", "rank")


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbours per query.

    The query side is broadcast (no shuffle of the corpus); score + rank
    happen JVM-side in whole-stage codegen. Output: (query_id, neighbor_id,
    rank) — ordered by cosine ROUNDED to 6 decimals with ties broken by
    neighbor id, so the ranking is robust to last-ulp summation noise and
    reproducible in the DuckDB oracle."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("cnorm", _norm(F.col("cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    ).withColumn("qnorm", _norm(F.col("qvec")))

    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            _cos6(F.col("cvec"), F.col("qvec"), F.col("cnorm"), F.col("qnorm")),
        )
    )
    return _rank_topk(scored, k)


def _hyperplane(dim: int, plane: int, seed: int = 7) -> list:
    """Deterministic pseudo-random unit hyperplane (pure Python, tiny)."""
    vals = []
    state = (seed * 1_000_003 + plane) & 0xFFFFFFFF
    for i in range(dim):
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        # Box–Muller-ish is overkill; centered uniform is fine for LSH signs
        vals.append(state / 0x7FFFFFFF - 0.5)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def signed_projection_buckets(
    df: DataFrame, id_col: str, vec_col: str, dim: int, planes_per_table: int = 12, tables: int = 4
) -> DataFrame:
    """Random-hyperplane LSH: per table, a `planes_per_table`-bit signature
    of sign(v·h). Same-bucket vectors have small angular distance whp.

    The tables×planes projection is ONE vectorized Arrow-batched pandas
    UDF (numpy (N×dim)·(dim×planes)), not a Catalyst expression tree: the
    expression form — 60 higher-order-function folds over a 3,840-literal
    matrix — cost ~4 s of driver-side analysis+codegen per build, twice
    per LSH query, dwarfing its execution; the numpy form is millisecond
    execution and zero plan-compile cost, and at scale the matmul is the
    textbook shape for a wide projection.

    ORACLE PARITY: the accumulation runs sequentially over the dim axis,
    so every per-(row,plane) float64 add/multiply happens in exactly the
    order of the previous left fold (F.aggregate(zip_with(...))) — the
    bucket bits are bit-identical to what the DuckDB oracle's per-plane
    list_inner_product sign test reproduces."""
    n_planes = tables * planes_per_table
    # dim × planes, so acc accumulates over rows of H
    H = np.array(
        [_hyperplane(dim, i) for i in range(n_planes)], dtype=np.float64
    ).T.copy()
    powers = 1 << np.arange(planes_per_table, dtype=np.int64)
    t_count = tables
    ppt = planes_per_table

    @F.pandas_udf("array<long>")
    def bucket_ids(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        V = np.array(vs.tolist(), dtype=np.float64)
        acc = np.zeros((V.shape[0], H.shape[1]), dtype=np.float64)
        for k in range(V.shape[1]):  # sequential over dims: left-fold order
            acc += V[:, k : k + 1] * H[k : k + 1, :]
        bits = acc > 0
        out = np.empty((V.shape[0], t_count), dtype=np.int64)
        for t in range(t_count):
            out[:, t] = bits[:, t * ppt : (t + 1) * ppt] @ powers
        return pd.Series(list(out))

    # posexplode_outer ≡ posexplode: the UDF returns a length-`tables`
    # array for every input row, never null/empty. The outer form keeps
    # InferFiltersFromGenerate from duplicating the Arrow-batched
    # projection UDF into a pushed size()>0 filter — a plain posexplode
    # here costs TWO ArrowEvalPython runs per consumer (filter + project,
    # guide §4.4 trap), measured in plans/r06/embedding_near_dup_before.txt
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(bucket_ids(F.col(vec_col).cast("array<double>"))).alias("tbl", "bucket"),
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    planes_per_table: int = 10,
    tables: int = 6,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket with
    the query in any table. Shuffle key = (table, bucket); the full
    corpus × query cross product never materializes."""
    cb = signed_projection_buckets(corpus, id_col, vec_col, dim, planes_per_table, tables)
    qb = signed_projection_buckets(queries, id_col, vec_col, dim, planes_per_table, tables)
    candidates = (
        cb.withColumnRenamed("id", "neighbor_id")
        .join(qb.withColumnRenamed("id", "query_id"), ["tbl", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # norms are precomputed PER ID (|corpus| + |queries| array folds), not
    # per candidate — a vector recurs in many candidate pairs, and the
    # per-pair work drops from 3 array aggregations to the dot product
    # alone. sqrt(fold) is the same arithmetic either way, so the rounded
    # cosine (and the oracle hash) is bit-identical.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("cnorm", _norm(F.col("cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    ).withColumn("qnorm", _norm(F.col("qvec")))
    scored = (
        candidates.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cos",
            _cos6(F.col("cvec"), F.col("qvec"), F.col("cnorm"), F.col("qnorm")),
        )
    )
    return _rank_topk(scored, k)


def embedding_near_dup(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", threshold: float = 0.95,
    dim: int = 64, planes_per_table: int = 10, tables: int = 6,
    max_bucket_size: int | None = None, max_broadcast_bytes: int = 128 << 20,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH candidates + exact
    cosine verification.

    Scale note: intra-bucket candidate pairs grow QUADRATICALLY with
    bucket density (10× corpus at fixed planes ⇒ ~100× pairs — measured
    in the sf0.1→sf1.0 scale validation, where this query's 7.6× wall
    ratio was the bench's worst). Two levers, same as dedup's
    ``max_shingle_df``: scale ``planes_per_table`` with log2(corpus) so
    density stays constant, and/or set ``max_bucket_size`` to drop
    buckets denser than the cap from candidate generation (broadcast
    anti-join, no extra shuffle of the big side). Recall trade-off: a
    pair whose shared buckets are ALL above the cap is missed — that
    region of embedding space is so dense that its members have many
    near-dups each, so the practical loss is which twin survives, not
    whether dup-mass is found. The cap is deterministic (a pure function
    of the bucket assignment), so capped runs stay oracle-reproducible.

    Cost shape (r6): the (id, tbl, bucket) assignment is materialized
    once — the hot-bucket aggregate, the anti-join probe and the a/b
    candidate sides otherwise each re-run the Arrow projection UDF (4
    ArrowEvalPython nodes measured, plans/r06/embedding_near_dup_before
    .txt); the exact-verify stage then computes vectors/norms only for
    ids that occur in a candidate pair (broadcast semi-join prune)."""
    from .dedup import materialize

    buckets = materialize(
        signed_projection_buckets(df, id_col, vec_col, dim, planes_per_table, tables)
    )
    if max_bucket_size is not None:
        hot = (
            buckets.groupBy("tbl", "bucket")
            .count()
            .where(F.col("count") > max_bucket_size)
            .select("tbl", "bucket")
        )
        buckets = buckets.join(F.broadcast(hot), ["tbl", "bucket"], "left_anti")
    a = buckets.withColumnRenamed("id", "id_a")
    b = buckets.withColumnRenamed("id", "id_b")
    cand = (
        a.join(b, ["tbl", "bucket"]).where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
    )
    n_vecs = df.count()
    broadcast_verify = n_vecs * dim * 8 <= max_broadcast_bytes
    if not broadcast_verify:
        # the join-plan verify consumes the candidate list three times
        # (both pair joins + the semi-join id set) — cut the DAG once;
        # the broadcast path consumes it once and stays fully lazy
        cand = materialize(cand)
    # per-ID norm precompute (N array folds) instead of per-PAIR (2 folds
    # per candidate): the exact-verify stage was 3 aggregate folds per
    # candidate pair and dominated the sf1.0 wall (measured: 2.6 of 3.9 s
    # on 1.47 M candidates); sqrt(fold) per id is the same arithmetic, so
    # the rounded cosine stays bit-identical to the oracle.
    # Exact verify. Guide-§8 shape: every decision needs only (id_a, id_b,
    # dot, na, nb) — 40 bytes per pair — yet the join formulation attaches
    # BOTH full dim-double vectors to every candidate row (2×dim×8 B/pair
    # across two shuffles) and folds the dot product per pair in the
    # interpreted HOF evaluator (measured 3.3 s of the 6.5 s query at
    # sf1.0, 1.47 M candidates). When the corpus vector matrix is small
    # enough to broadcast (rows × dim × 8 B ≤ max_broadcast_bytes), ship
    # ONLY the id pairs and compute dot + norms vectorized against the
    # broadcast matrix — accumulating sequentially over the dim axis, so
    # every float64 add/multiply happens in exactly the left-fold order of
    # the F.aggregate formulation and the rounded cosine is bit-identical
    # (same argument as signed_projection_buckets / ann_cosine_ivf).
    # Division + round stay in Catalyst, unchanged. Corpora past the
    # broadcast bound keep the join plan (the 100 TB-safe shape).
    if broadcast_verify:
        rows = df.select(
            F.col(id_col).cast("long"), F.col(vec_col).cast("array<double>")
        ).collect()
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        V = np.array([r[1] for r in rows], dtype=np.float64)
        order = np.argsort(ids)
        ids, V = ids[order], V[order].copy()
        acc = np.zeros(len(ids), dtype=np.float64)
        for k in range(V.shape[1]):  # sequential over dims: left-fold order
            acc += V[:, k] * V[:, k]
        nrm = np.sqrt(acc)
        bc = df.sparkSession.sparkContext.broadcast((ids, V, nrm))

        @F.pandas_udf("array<double>")
        def pair_dot(ia: pd.Series, ib: pd.Series) -> pd.Series:
            bids, bV, bnrm = bc.value
            if not len(ia):
                return pd.Series([], dtype=object)
            xa = np.searchsorted(bids, ia.to_numpy())
            xb = np.searchsorted(bids, ib.to_numpy())
            A, B = bV[xa], bV[xb]
            d = np.zeros(len(A), dtype=np.float64)
            for k in range(A.shape[1]):  # left-fold order again
                d += A[:, k] * B[:, k]
            out = np.stack([d, bnrm[xa], bnrm[xb]], axis=1)
            return pd.Series(list(out))

        # nondeterministic marker (guide §4.4): the threshold filter below
        # references the UDF output — without it the optimizer duplicates
        # the UDF into a pushed filter (two ArrowEvalPython runs per pair)
        dnn = pair_dot.asNondeterministic()(F.col("id_a"), F.col("id_b"))
        scored = cand.withColumn("_d", dnn).withColumn(
            "cos",
            F.round(
                F.element_at(F.col("_d"), 1)
                / (F.element_at(F.col("_d"), 2) * F.element_at(F.col("_d"), 3)),
                6,
            ),
        )
        return scored.where(F.col("cos") >= threshold).select("id_a", "id_b", "cos")

    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    vecs = df.join(F.broadcast(cand_ids), id_col, "left_semi").select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    return (
        cand.join(
            vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                        F.col("nrm").alias("na")),
            "id_a",
        )
        .join(
            vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                        F.col("nrm").alias("nb")),
            "id_b",
        )
        # round BEFORE thresholding (same _cos6 rule as the top-k rankers)
        .withColumn("cos", _cos6(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def ann_cosine_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    centroids: DataFrame | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF (inverted-file) ANN: the coarse-quantizer counterpart to the
    LSH path. Corpus vectors are assigned to their nearest centroid; a
    query scores only the lists of its ``n_probe`` nearest centroids.

    Scale shape: assignment is ONE Arrow-batched pandas UDF per corpus
    partition (numpy matmul against the broadcast centroid matrix — no
    shuffle, no per-row Python); candidate generation is an equi-join on
    the centroid id (the inverted list key). With the default
    ``broadcast_queries=True`` the exploded query side (queries × n_probe
    rows, full embedding vectors) is FORCE-broadcast — right for the
    common few-queries/huge-corpus shape, an OOM hazard for large query
    sets: pass ``broadcast_queries=False`` there and both sides shuffle
    on the centroid id (AQE still picks a broadcast join on its own when
    the exploded side measures small). Exact rescoring + round-then-rank
    exactly as the brute-force baseline, so IVF output ⊆ brute-force
    candidates with identical scoring.

    The default centroid set is the corpus head (``id < n_centroids``) —
    deliberately deterministic so the ENTIRE index build is reproducible
    in the DuckDB oracle. On a real cluster pass ``centroids=`` from a
    kmeans||/sampled build; every plan shape downstream is unchanged.

    ORACLE PARITY: centroid cosines accumulate sequentially over the dim
    axis (left-fold order, see signed_projection_buckets) and are rounded
    to 6 decimals before the argmax/top-probe selection with ties to the
    SMALLEST centroid id — the same total order the oracle's
    row_number() OVER (ORDER BY cos DESC, cid) induces."""
    cent_df = (
        centroids
        if centroids is not None
        else corpus.where(F.col(id_col) < n_centroids)
    )
    cent_rows = cent_df.select(
        F.col(id_col).cast("long").alias("cid"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).collect()  # tiny by construction (n_centroids rows)
    if not cent_rows:
        # fail here with a clear message instead of an IndexError deep in
        # the assignment UDF: the id-prefix default only works for dense
        # integer ids starting near 0
        raise ValueError(
            "ann_cosine_ivf: centroid set is empty — the default selection "
            f"({id_col} < {n_centroids}) matched no rows; pass centroids= "
            "explicitly for non-integer or offset id spaces"
        )
    cent_rows.sort(key=lambda r: r["cid"])
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    C = np.array([r["cv"] for r in cent_rows], dtype=np.float64).T.copy()  # dim × C
    cnorm = np.sqrt((C * C).sum(axis=0))

    def _cent_cos(vs: pd.Series) -> np.ndarray:
        V = np.array(vs.tolist(), dtype=np.float64)  # n × dim
        acc = np.zeros((V.shape[0], C.shape[1]), dtype=np.float64)
        for d in range(V.shape[1]):  # sequential over dims: left-fold order
            acc += V[:, d : d + 1] * C[d : d + 1, :]
        vnorm = np.sqrt((V * V).sum(axis=1))
        return np.round(acc / (vnorm[:, None] * cnorm[None, :]), 6)

    @F.pandas_udf("long")
    def assign_centroid(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="int64")
        cos = _cent_cos(vs)
        # cids ascend, np.argmax returns the FIRST max → smallest cid on ties
        return pd.Series(cids[np.argmax(cos, axis=1)])

    n_p = n_probe

    @F.pandas_udf("array<long>")
    def probe_centroids(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        cos = _cent_cos(vs)
        # top n_probe by (cos desc, cid asc): lexsort keys last-is-primary
        order = np.lexsort((np.broadcast_to(cids, cos.shape), -cos), axis=1)
        return pd.Series(list(cids[order[:, :n_p]]))

    corp = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("cid", assign_centroid(F.col("cvec"))).withColumn("cnorm", _norm(F.col("cvec")))
    qp = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qvec"),
        )
        # outer ≡ inner: probe_centroids always returns n_probe ids; the
        # outer form avoids a duplicated ArrowEvalPython (inferred filter)
        .withColumn("cid", F.explode_outer(probe_centroids(F.col("qvec"))))
        .withColumn("qnorm", _norm(F.col("qvec")))
    )
    scored = (
        corp.join(F.broadcast(qp) if broadcast_queries else qp, "cid")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            _cos6(F.col("cvec"), F.col("qvec"), F.col("cnorm"), F.col("qnorm")),
        )
    )
    return _rank_topk(scored, k)
