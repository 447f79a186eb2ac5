"""IVF ANN: exactness and recall invariants against the brute-force baseline."""

import pytest

from pyspark.sql import functions as F

from scotty_window_processor_spark.plans.similarity import (
    ann_cosine_ivf,
    cosine_topk_bruteforce,
)

from spark_fixtures import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_full_probe_equals_bruteforce(spark, emb):
    """With n_probe = n_centroids every inverted list is scanned, so the
    candidate set is the whole corpus and IVF must reproduce the exact
    brute-force ranking (same round-then-rank tie-breaks)."""
    q = emb.where(F.col("vec_id") < 5)
    exact = sorted(tuple(r) for r in cosine_topk_bruteforce(emb, q, k=10).collect())
    ivf = sorted(
        tuple(r)
        for r in ann_cosine_ivf(emb, q, k=10, n_centroids=8, n_probe=8).collect()
    )
    assert ivf == exact


def test_partial_probe_subset_and_shape(spark, emb):
    """n_probe < n_centroids: per query exactly <= k results, ranks are
    dense from 1, and every (query, neighbor) pair also appears in the
    brute-force candidate universe (sanity: no invented neighbors)."""
    q = emb.where(F.col("vec_id") < 5)
    rows = ann_cosine_ivf(emb, q, k=10, n_centroids=8, n_probe=2).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert r["neighbor_id"] != r["query_id"]
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10


def test_deterministic_across_runs(spark, emb):
    q = emb.where(F.col("vec_id") < 5)
    a = sorted(tuple(r) for r in ann_cosine_ivf(emb, q, k=5).collect())
    b = sorted(tuple(r) for r in ann_cosine_ivf(emb, q, k=5).collect())
    assert a == b and len(a) > 0


def test_near_dup_bucket_cap_prunes_dense_region(spark):
    """max_bucket_size drops LSH buckets denser than the cap from
    candidate generation: a 30-member identical-vector clique (O(n²)
    pairs) disappears, a normal near-dup pair elsewhere survives, and
    cap=None reproduces the uncapped pair set exactly."""
    from scotty_window_processor_spark.plans.similarity import embedding_near_dup

    dim = 8
    clique = [(i, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]) for i in range(30)]
    pair = [
        (100, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (101, [0.0, 1.0, 0.05, 0.0, 0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(clique + pair, ["vec_id", "embedding"])

    uncapped = embedding_near_dup(df, dim=dim, threshold=0.95)
    got_unc = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    assert (100, 101) in got_unc
    assert len(got_unc) == 30 * 29 // 2 + 1  # full clique + the pair

    capped = embedding_near_dup(df, dim=dim, threshold=0.95, max_bucket_size=10)
    got_cap = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got_cap                      # sparse region intact
    assert not any(a < 30 and b < 30 for a, b in got_cap)  # clique pruned
