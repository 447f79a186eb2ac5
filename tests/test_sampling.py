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
