"""Spark-parity tests: the kernel-backed batch operator and the numpy fast
path must agree with each other and with Catalyst built-in window plans.
"""

import pytest

from pyspark.sql import functions as F

from scotty_window_processor_spark.functions import (
    CountAggregation,
    MaxAggregation,
    SumAggregation,
)
from scotty_window_processor_spark.operators import (
    SessionWindow,
    SlidingWindow,
    TumblingWindow,
    WindowMeasure,
)
from scotty_window_processor_spark.plans.scotty_batch import scotty_window_aggregate
from scotty_window_processor_spark.plans.windowed import (
    session_aggregate,
    sliding_aggregate,
    tumbling_aggregate,
)
from scotty_window_processor_spark.sources import synthesize_transcripts

from spark_fixtures import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


@pytest.fixture(scope="module")
def transcripts(spark):
    df = synthesize_transcripts(
        spark, n_convs=20, turns_per_conv=30, n_hot_convs=1, hot_factor=10,
        disorder_pct=0, straggler_pct=0,
    ).cache()
    df.count()
    return df


def _normalize(df, value_cols):
    rows = df.collect()
    return sorted(
        (r["conv_id"], r["w_start"], r["w_end"], *[round(float(r[c]), 6) for c in value_cols])
        for r in rows
    )


def test_tumbling_kernel_matches_catalyst(spark, transcripts):
    size_ms = 600_000
    kernel = scotty_window_aggregate(
        transcripts.withColumn("one", F.lit(1.0)),
        key="conv_id", ts="ts", value="one",
        windows=[TumblingWindow(WindowMeasure.TIME, size_ms)],
        aggs=[("turns", "double", CountAggregation)],
    ).select("conv_id", "w_start", "w_end", "turns")

    catalyst = tumbling_aggregate(
        transcripts, "conv_id", "ts", "10 minutes", {"turns": F.count(F.lit(1)).cast("double")}
    )
    assert _normalize(kernel, ["turns"]) == _normalize(catalyst, ["turns"])


def test_sliding_kernel_matches_catalyst(spark, transcripts):
    kernel = scotty_window_aggregate(
        transcripts.withColumn("one", F.lit(1.0)),
        key="conv_id", ts="ts", value="one",
        windows=[SlidingWindow(WindowMeasure.TIME, 600_000, 200_000)],
        aggs=[("turns", "double", CountAggregation)],
    ).select("conv_id", "w_start", "w_end", "turns")

    catalyst = sliding_aggregate(
        transcripts, "conv_id", "ts", "10 minutes", "200 seconds",
        {"turns": F.count(F.lit(1)).cast("double")},
    )
    assert _normalize(kernel, ["turns"]) == _normalize(catalyst, ["turns"])


def test_multiwindow_sharing_matches_two_catalyst_runs(spark, transcripts):
    """Two concurrent tumbling windows in ONE kernel pass (shared slices)
    must equal two separate Catalyst window aggregations."""
    df = transcripts.withColumn("one", F.lit(1.0))
    shared = scotty_window_aggregate(
        df, key="conv_id", ts="ts", value="one",
        windows=[
            TumblingWindow(WindowMeasure.TIME, 600_000, window_id=1),
            TumblingWindow(WindowMeasure.TIME, 1_800_000, window_id=2),
        ],
        aggs=[("turns", "double", CountAggregation)],
    )
    small = shared.where(F.col("window_id") == 1).select("conv_id", "w_start", "w_end", "turns")
    large = shared.where(F.col("window_id") == 2).select("conv_id", "w_start", "w_end", "turns")

    c_small = tumbling_aggregate(df, "conv_id", "ts", "10 minutes", {"turns": F.count(F.lit(1)).cast("double")})
    c_large = tumbling_aggregate(df, "conv_id", "ts", "30 minutes", {"turns": F.count(F.lit(1)).cast("double")})
    assert _normalize(small, ["turns"]) == _normalize(c_small, ["turns"])
    assert _normalize(large, ["turns"]) == _normalize(c_large, ["turns"])


def test_session_kernel_matches_catalyst(spark, transcripts):
    gap_ms = 120_000
    # force_kernel pins the pure-Python slicing kernel (tier 3); without it
    # session+Count routes to F.session_window and this would compare
    # Catalyst to Catalyst
    kernel = scotty_window_aggregate(
        transcripts.withColumn("one", F.lit(1.0)),
        key="conv_id", ts="ts", value="one",
        windows=[SessionWindow(WindowMeasure.TIME, gap_ms)],
        aggs=[("turns", "double", CountAggregation)],
        force_kernel=True,
    ).select("conv_id", "w_start", "w_end", "turns")

    catalyst = session_aggregate(
        transcripts, "conv_id", "ts", "2 minutes", {"turns": F.count(F.lit(1)).cast("double")}
    )
    assert _normalize(kernel, ["turns"]) == _normalize(catalyst, ["turns"])


def test_fast_path_matches_kernel_path(spark, transcripts):
    """sum/max via numpy fast path vs forced kernel loop (MaxAggregation is
    fast-path-eligible; adding a session window forces the kernel)."""
    df = transcripts.withColumn("v", F.col("turn_idx").cast("double"))
    fast = scotty_window_aggregate(
        df, key="conv_id", ts="ts", value="v",
        windows=[SlidingWindow(WindowMeasure.TIME, 600_000, 300_000)],
        aggs=[("s", "double", SumAggregation), ("mx", "double", MaxAggregation)],
    ).select("conv_id", "w_start", "w_end", "s", "mx")

    from scotty_window_processor_spark.plans import scotty_batch as sb

    orig = sb._fast_path_eligible
    sb._fast_path_eligible = lambda *a, **k: False
    try:
        slow = scotty_window_aggregate(
            df, key="conv_id", ts="ts", value="v",
            windows=[SlidingWindow(WindowMeasure.TIME, 600_000, 300_000)],
            aggs=[("s", "double", SumAggregation), ("mx", "double", MaxAggregation)],
        ).select("conv_id", "w_start", "w_end", "s", "mx")
        assert _normalize(fast, ["s", "mx"]) == _normalize(slow, ["s", "mx"])
    finally:
        sb._fast_path_eligible = orig


def test_vectorized_session_and_count_match_kernel(spark, transcripts):
    """Sessions (gaps-and-islands) and count windows through the numpy path
    vs the per-element kernel."""
    from scotty_window_processor_spark.functions import CountAggregation, SumAggregation
    from scotty_window_processor_spark.plans import scotty_batch as sb

    df = transcripts.withColumn("v", F.col("turn_idx").cast("double"))
    args = dict(
        key="conv_id", ts="ts", value="v",
        windows=[
            SessionWindow(WindowMeasure.TIME, 120_000, window_id=1),
            TumblingWindow(WindowMeasure.COUNT, 7, window_id=2),
            TumblingWindow(WindowMeasure.TIME, 600_000, window_id=3),
        ],
        aggs=[("s", "double", SumAggregation), ("n", "long", CountAggregation)],
        arrival_order="turn_idx",
    )
    fast = scotty_window_aggregate(df, **args).select(
        "conv_id", "window_id", "w_start", "w_end", "s", "n")
    assert sb._fast_path_eligible(args["windows"], args["aggs"])

    orig = sb._fast_path_eligible
    sb._fast_path_eligible = lambda *a, **k: False
    try:
        slow = scotty_window_aggregate(df, **args).select(
            "conv_id", "window_id", "w_start", "w_end", "s", "n")
        norm = lambda d: sorted(tuple(r) for r in d.collect())
        assert norm(fast) == norm(slow)
    finally:
        sb._fast_path_eligible = orig


def test_global_aggregate_catalyst_vs_kernel(spark, transcripts):
    """Non-keyed (GlobalScottyWindowOperator analogue): the Catalyst tier
    (groupBy(window) only, map-side partials) and the single-kernel tier
    must produce identical global windows."""
    from scotty_window_processor_spark.plans.scotty_batch import scotty_global_aggregate

    df = transcripts.withColumn("v", F.col("turn_idx").cast("double"))
    args = dict(
        ts="ts", value="v",
        windows=[TumblingWindow(WindowMeasure.TIME, 600_000, window_id=1)],
        aggs=[("n", "long", CountAggregation), ("s", "double", SumAggregation)],
    )
    fast = scotty_global_aggregate(df, **args).select("w_start", "w_end", "n", "s")
    slow = scotty_global_aggregate(df, **args, force_kernel=True).select(
        "w_start", "w_end", "n", "s")
    norm = lambda d: sorted(tuple(r) for r in d.collect())
    a, b = norm(fast), norm(slow)
    assert a and a == b
