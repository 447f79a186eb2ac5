"""Hot-key detection: exact below the row threshold, sampled above it,
with the documented false-negative guard (margin + absolute-share floor)."""

import pytest

from pyspark.sql import functions as F

from spark_fixtures import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _skewed_df(spark, n_keys=200, base=20, hot_key="k7", hot_mult=100):
    """n_keys uniform keys with `base` rows each, one key at hot_mult×."""
    uniform = spark.range(n_keys * base).select(
        F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")).alias("key"),
        F.col("id").alias("v"),
    )
    hot = spark.range(base * hot_mult).select(
        F.lit(hot_key).alias("key"), (F.col("id") + 10_000_000).alias("v")
    )
    return uniform.union(hot)


def test_detect_hot_keys_exact_small_input(spark):
    from scotty_window_processor_spark.plans.skew import detect_hot_keys

    df = _skewed_df(spark)
    hot = detect_hot_keys(df, "key", factor=10.0)
    assert "k7" in hot
    assert len(hot) == 1


def test_detect_hot_keys_samples_above_threshold(spark):
    """Force the sampled path with a tiny max_exact_rows: the hot key must
    still be found from a ~25% sample (margin bounds false negatives)."""
    from scotty_window_processor_spark.plans.skew import detect_hot_keys

    df = _skewed_df(spark, base=40, hot_mult=80)
    n = df.count()
    hot = detect_hot_keys(
        df, "key", factor=10.0, max_exact_rows=1000, sample_rows=n // 4
    )
    assert "k7" in hot
    # margin over-flags at most warm keys, never most of the key space
    assert len(hot) < 20


def test_detect_hot_keys_absolute_share_floor(spark):
    """When the typical key has <1 expected sample row the sample median is
    biased toward 1; a key holding >hot_share of all rows is still flagged
    via the absolute floor."""
    from scotty_window_processor_spark.plans.skew import detect_hot_keys

    # 20k keys × 1 row + one key with 5% of all rows
    uniform = spark.range(20_000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("key"),
        F.col("id").alias("v"),
    )
    hot_rows = spark.range(1_000).select(
        F.lit("whale").alias("key"), F.col("id").alias("v")
    )
    df = uniform.union(hot_rows)
    hot = detect_hot_keys(
        df,
        "key",
        factor=10.0,
        max_exact_rows=100,       # force sampling
        sample_rows=2_000,        # ~10% sample: uniform keys ≈ 0.1 rows each
        hot_share=0.01,
    )
    assert "whale" in hot


def test_detect_hot_keys_empty_input(spark):
    from scotty_window_processor_spark.plans.skew import detect_hot_keys

    empty = spark.range(0).select(F.lit("k").alias("key"))
    assert detect_hot_keys(empty, "key", max_exact_rows=0) == []
