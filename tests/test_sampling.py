"""Deterministic sampling / split operators (plans/sampling.py).

Properties under test, in 100-TB order of importance:
- membership is a pure function of (salt, id): stable across
  repartitioning and across incremental appends (the leakage-control
  property a train/val split actually needs);
- ``deterministic_split`` is a narrow zero-shuffle projection (no
  Exchange in the executed plan);
- ``stratified_sample_cap`` shuffles only the tiny stratum-size agg;
  the data side is filtered via a broadcast join;
- exact DuckDB parity is carried by the ``dataset_split`` /
  ``stratified_sample`` gates in __spark_entry__.py — here we pin the
  operator-level contracts the gates can't see.
"""

import pytest
from pyspark.sql import functions as F

from spark_fixtures import get_spark

SF = "/root/testdata/sf0.001"
SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def spark():
    return get_spark()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _assignments(df):
    return {r["doc_id"]: r["split"] for r in df.select("doc_id", "split").collect()}


def test_split_covers_every_row_exactly_once(spark, docs):
    from scotty_window_processor_spark.plans.sampling import deterministic_split

    out = deterministic_split(docs, "doc_id", SPLITS)
    assert out.count() == docs.count()
    names = {r["split"] for r in out.select("split").distinct().collect()}
    assert names <= set(SPLITS)


def test_split_fractions_roughly_respected(spark, docs):
    from scotty_window_processor_spark.plans.sampling import deterministic_split

    n = docs.count()
    counts = {
        r["split"]: r["c"]
        for r in deterministic_split(docs, "doc_id", SPLITS)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    # 500 docs: binomial 3-sigma bounds around the expected fractions
    for name, frac in SPLITS.items():
        exp = frac * n
        sigma = (n * frac * (1 - frac)) ** 0.5
        assert abs(counts.get(name, 0) - exp) <= 3 * sigma + 1, (name, counts)


def test_split_stable_under_repartition(spark, docs):
    from scotty_window_processor_spark.plans.sampling import deterministic_split

    base = _assignments(deterministic_split(docs, "doc_id", SPLITS))
    shuffled = _assignments(
        deterministic_split(docs.repartition(13, "lang"), "doc_id", SPLITS)
    )
    assert base == shuffled


def test_split_stable_under_append(spark, docs):
    """A row's membership never changes when new data arrives — the
    no-leakage guarantee for incremental corpus builds."""
    from scotty_window_processor_spark.plans.sampling import deterministic_split

    half = docs.where(F.col("n_chars") % 2 == 0)
    partial = _assignments(deterministic_split(half, "doc_id", SPLITS))
    full = _assignments(deterministic_split(docs, "doc_id", SPLITS))
    assert partial == {k: full[k] for k in partial}


def test_split_salt_gives_independent_resplit(spark, docs):
    from scotty_window_processor_spark.plans.sampling import deterministic_split

    a = _assignments(deterministic_split(docs, "doc_id", SPLITS, salt="run-a"))
    b = _assignments(deterministic_split(docs, "doc_id", SPLITS, salt="run-b"))
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 0  # different salt reshuffles membership


def test_split_is_zero_shuffle(spark, docs):
    from scotty_window_processor_spark.plans.sampling import deterministic_split

    plan = (
        deterministic_split(docs, "doc_id", SPLITS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_split_validates_fractions(spark, docs):
    from scotty_window_processor_spark.plans.sampling import deterministic_split

    with pytest.raises(ValueError):
        deterministic_split(docs, "doc_id", {"train": 0.7, "val": 0.1})


def test_split_single_bucket_degenerate(spark, docs):
    from scotty_window_processor_spark.plans.sampling import deterministic_split

    out = deterministic_split(docs, "doc_id", {"all": 1.0})
    assert out.where(F.col("split") != "all").count() == 0


def test_stratified_sample_caps_big_and_keeps_small(spark, docs):
    from scotty_window_processor_spark.plans.sampling import stratified_sample_cap

    cap = 5
    sizes = {
        (r["lang"], r["source"]): r["c"]
        for r in docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    kept = {
        (r["lang"], r["source"]): r["c"]
        for r in stratified_sample_cap(docs, ["lang", "source"], "doc_id", cap)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert any(v > cap for v in sizes.values())  # the cap actually bites
    for stratum, sz in sizes.items():
        if sz <= cap:
            # at-or-under-cap strata pass through whole
            assert kept.get(stratum, 0) == sz, stratum
        else:
            # hash sampling: Binomial(sz, ~cap/sz) — 4-sigma upper bound
            rate = cap / sz
            sigma = (sz * rate * (1 - rate)) ** 0.5
            assert kept.get(stratum, 0) <= cap + 4 * sigma + 1, (stratum, sz)


def test_stratified_sample_is_deterministic(spark, docs):
    from scotty_window_processor_spark.plans.sampling import stratified_sample_cap

    a = sorted(
        r["doc_id"]
        for r in stratified_sample_cap(docs, ["lang"], "doc_id", 30).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in stratified_sample_cap(
            docs.repartition(7), ["lang"], "doc_id", 30
        ).collect()
    )
    assert a == b and a


def test_stratified_sample_broadcasts_rates(spark, docs):
    """The stratum-rate side must join back as a broadcast: the corpus
    side of the join never shuffles."""
    from scotty_window_processor_spark.plans.sampling import stratified_sample_cap

    plan = (
        stratified_sample_cap(docs, ["lang", "source"], "doc_id", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_split_preserves_columns_and_rows(spark, docs):
    from scotty_window_processor_spark.plans.sampling import deterministic_split

    out = deterministic_split(docs, "doc_id", SPLITS)
    assert set(out.columns) == set(docs.columns) | {"split"}


WEIGHTS = {"en": 0.4, "zh": 0.15, "es": 0.15, "de": 0.15, "fr": 0.15}


def test_mixture_composition_and_bottleneck(spark, docs):
    """Output composition tracks the target weights; the bottleneck
    group (max size_g/w_g deficit) passes (nearly) whole; no group is
    upsampled."""
    from scotty_window_processor_spark.plans.sampling import downsample_to_mixture

    sizes = {
        r["lang"]: r["c"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    out = downsample_to_mixture(docs, "lang", WEIGHTS, "doc_id")
    kept = {
        r["lang"]: r["c"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n_target = min(sizes[g] / w for g, w in WEIGHTS.items())
    for g, w in WEIGHTS.items():
        exp = w * n_target
        sigma = (sizes[g] * (exp / sizes[g]) * (1 - min(1, exp / sizes[g]))) ** 0.5
        assert kept.get(g, 0) <= sizes[g]  # never upsampled
        assert abs(kept.get(g, 0) - exp) <= 4 * sigma + 2, (g, kept.get(g), exp)


def test_mixture_drops_unlisted_groups_and_validates(spark, docs):
    from scotty_window_processor_spark.plans.sampling import downsample_to_mixture

    out = downsample_to_mixture(docs, "lang", {"en": 0.6, "zh": 0.4}, "doc_id")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs <= {"en", "zh"}
    with pytest.raises(ValueError):
        downsample_to_mixture(docs, "lang", {"en": 0.5}, "doc_id")
    with pytest.raises(ValueError):
        downsample_to_mixture(docs, "lang", WEIGHTS, "doc_id", scale=0.0)


def test_mixture_scale_shrinks_proportionally(spark, docs):
    from scotty_window_processor_spark.plans.sampling import downsample_to_mixture

    full = downsample_to_mixture(docs, "lang", WEIGHTS, "doc_id").count()
    half = downsample_to_mixture(docs, "lang", WEIGHTS, "doc_id", scale=0.5).count()
    assert 0.3 * full <= half <= 0.7 * full


def test_mixture_stable_under_repartition(spark, docs):
    from scotty_window_processor_spark.plans.sampling import downsample_to_mixture

    a = sorted(
        r["doc_id"]
        for r in downsample_to_mixture(docs, "lang", WEIGHTS, "doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in downsample_to_mixture(
            docs.repartition(11, "source"), "lang", WEIGHTS, "doc_id"
        ).collect()
    )
    assert a == b and a


def _exact_expected(docs, strata, k):
    """Brute-force oracle: rank by (bucket, doc_id) per stratum in pandas."""
    from scotty_window_processor_spark.plans.sampling import split_bucket

    pdf = docs.select(
        *strata, "doc_id", split_bucket(F.col("doc_id"), "sample-v1").alias("b")
    ).toPandas()
    pdf = pdf.sort_values(["b", "doc_id"])
    pdf["rnk"] = pdf.groupby(strata).cumcount() + 1
    return {
        (tuple(r[s] for s in strata) + (r["doc_id"],)): r["rnk"]
        for _, r in pdf.iterrows()
        if r["rnk"] <= k
    }


def test_exact_sample_matches_bruteforce(spark, docs):
    from scotty_window_processor_spark.plans.sampling import stratified_sample_exact

    k = 3
    exp = _exact_expected(docs, ["lang", "source"], k)
    got = {
        (r["lang"], r["source"], r["doc_id"]): r["sample_rank"]
        for r in stratified_sample_exact(
            docs, ["lang", "source"], "doc_id", k
        ).collect()
    }
    assert got == exp


def test_exact_sample_prefilter_paths_agree(spark, docs):
    """Naive full-rank path, default prefilter, and a forced-fallback
    threshold (t=1 starves every stratum -> full re-read) must all emit
    identical membership and ranks."""
    from scotty_window_processor_spark.plans.sampling import stratified_sample_exact

    def ids(**kw):
        return sorted(
            (r["lang"], r["doc_id"], r["sample_rank"])
            for r in stratified_sample_exact(
                docs, ["lang"], "doc_id", 7, **kw
            ).collect()
        )

    naive = ids(prefilter_margin=None)
    assert ids() == naive
    assert ids(_threshold_num=1) == naive  # fallback union exercised
    assert len(naive) == 5 * 7  # 5 langs, each bigger than k


def test_exact_sample_k_exceeds_stratum(spark, docs):
    """k >= stratum size keeps the whole stratum, ranked."""
    from scotty_window_processor_spark.plans.sampling import stratified_sample_exact

    n = docs.count()
    out = stratified_sample_exact(docs, ["lang"], "doc_id", k=10**6)
    assert out.count() == n
    # ranks within each lang are a contiguous 1..size sequence
    per = {
        r["lang"]: (r["mn"], r["mx"], r["c"])
        for r in out.groupBy("lang")
        .agg(
            F.min("sample_rank").alias("mn"),
            F.max("sample_rank").alias("mx"),
            F.count(F.lit(1)).alias("c"),
        )
        .collect()
    }
    for lang, (mn, mx, c) in per.items():
        assert mn == 1 and mx == c, (lang, per[lang])


def test_exact_sample_is_exactly_k(spark, docs):
    from scotty_window_processor_spark.plans.sampling import stratified_sample_exact

    kept = (
        stratified_sample_exact(docs, ["lang", "source"], "doc_id", 2)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    sizes = {
        (r["lang"], r["source"]): r["c"]
        for r in docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in kept:
        assert r["c"] == min(2, sizes[(r["lang"], r["source"])])
    assert len(kept) == len(sizes)


# ---------------------------------------------------------------------------
# global_shuffle


def test_global_shuffle_is_total_permutation(spark, docs):
    from scotty_window_processor_spark.plans.sampling import global_shuffle

    out = global_shuffle(docs, "doc_id", n_shards=8).cache()
    assert out.count() == docs.count()
    # every row gets exactly one coordinate; positions are dense 1..n
    # within each shard (the property that makes shard files streamable)
    per = out.groupBy("shard").agg(
        F.min("pos").alias("mn"), F.max("pos").alias("mx"), F.count(F.lit(1)).alias("c")
    )
    for r in per.collect():
        assert r["mn"] == 1 and r["mx"] == r["c"], r
    assert per.count() == 8
    out.unpersist()


def test_global_shuffle_stable_under_repartition(spark, docs):
    from scotty_window_processor_spark.plans.sampling import global_shuffle

    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in global_shuffle(docs, "doc_id").collect()}
    b = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in global_shuffle(docs.repartition(13), "doc_id").collect()
    }
    assert a == b


def test_global_shuffle_appends_preserve_relative_order(spark, docs):
    from scotty_window_processor_spark.plans.sampling import global_shuffle

    half = docs.where(F.col("doc_id") % 2 == 0)
    small = global_shuffle(half, "doc_id").collect()
    full = {r["doc_id"]: (r["shard"], r["pos"]) for r in global_shuffle(docs, "doc_id").collect()}
    # a row's shard never changes when data is appended, and within a
    # shard the RELATIVE order of old rows is preserved (pos is dense,
    # so absolute positions shift as new rows interleave)
    for shard in {r["shard"] for r in small}:
        olds = sorted(
            (r["pos"], r["doc_id"]) for r in small if r["shard"] == shard
        )
        order_small = [d for _, d in olds]
        order_full = sorted(order_small, key=lambda d: full[d][1])
        assert all(full[d][0] == shard for d in order_small)
        assert order_small == order_full
