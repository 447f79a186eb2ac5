"""Physical-plan guarantees: predicate pushdown, column pruning, broadcast
joins, no stray shuffles — the properties that decide 100 TB behaviour."""

import pytest

from pyspark.sql import functions as F

from spark_fixtures import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    from scotty_window_processor_spark.plans.relational import load, pricing_summary

    plan = plan_of(pricing_summary(load(spark, SF, "lineitem")))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_dimension_joins_are_broadcast(spark):
    from scotty_window_processor_spark.plans.relational import load, revenue_by_nation

    plan = plan_of(
        revenue_by_nation(load(spark, SF, "orders"), load(spark, SF, "customer"), load(spark, SF, "nation"))
    )
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_window_aggregate_prunes_payload_columns(spark):
    """The text payload must never cross the shuffle or the Arrow boundary."""
    from scotty_window_processor_spark.functions import CountAggregation
    from scotty_window_processor_spark.operators import TumblingWindow, WindowMeasure
    from scotty_window_processor_spark.plans.scotty_batch import scotty_window_aggregate
    from scotty_window_processor_spark.sources import synthesize_transcripts

    tdir = "/tmp/plan_check_transcripts"
    synthesize_transcripts(spark, n_convs=5, turns_per_conv=10).write.mode("overwrite").parquet(tdir)
    df = spark.read.parquet(tdir).withColumn("one", F.lit(1.0))
    out = scotty_window_aggregate(
        df, key="conv_id", ts="ts", value="one",
        windows=[TumblingWindow(WindowMeasure.COUNT, 5)],  # forces Arrow tier
        aggs=[("n", "long", CountAggregation)],
    )
    plan = plan_of(out)
    scan_schema = plan.split("ReadSchema:")[-1].splitlines()[0]
    assert "text" not in scan_schema, f"payload column read from parquet: {scan_schema}"
    assert "role" not in scan_schema


def test_catalyst_tier_uses_builtin_window_aggregate(spark):
    """Standard aggs over time windows must compile to pure JVM plans —
    no Python evaluation nodes anywhere."""
    from scotty_window_processor_spark.functions import CountAggregation
    from scotty_window_processor_spark.operators import TumblingWindow, WindowMeasure
    from scotty_window_processor_spark.plans.scotty_batch import scotty_window_aggregate

    events = spark.read.parquet(f"{SF}/events.parquet")
    out = scotty_window_aggregate(
        events, key="user_id", ts="ts", value="value",
        windows=[TumblingWindow(WindowMeasure.TIME, 3_600_000)],
        aggs=[("n", "long", CountAggregation)],
    )
    plan = plan_of(out)
    assert "Python" not in plan and "Arrow" not in plan, plan[:500]
    assert "HashAggregate" in plan


def test_ngram_jaccard_plan_shape(spark):
    """The df-cap is a BROADCAST anti-join (hot shingles only — never a
    second shuffle of the exploded side) and the candidate generator is a
    hash self-join on the 8-byte shingle key: no cartesian product
    anywhere."""
    from scotty_window_processor_spark.plans.dedup import dedup_ngram_jaccard

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(dedup_ngram_jaccard(docs, threshold=0.35, max_shingle_df=50))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]


def test_minhash_lsh_plan_has_no_cartesian(spark):
    from scotty_window_processor_spark.plans.dedup import dedup_minhash_lsh

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(dedup_minhash_lsh(docs, verify_threshold=0.35))
    assert "CartesianProduct" not in plan


def test_shingle_producer_not_reinlined(spark):
    """let_ guard: the word-hash transform must appear ONCE in the
    projection, not once per gram reference (CollapseProject inlining —
    the 300x regression class)."""
    from scotty_window_processor_spark.plans.dedup import portable_shingle_docs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(portable_shingle_docs(docs, "doc_id", "text"))
    # the md5 of the word appears exactly once (inside the single bound
    # lambda), not replicated per chain step reference
    assert plan.count("md5") == 1, f"word-hash producer inlined {plan.count('md5')}x"


def test_many_windows_route_to_shared_shuffle_tier(spark):
    """Cost-based tier choice: >3 concurrent time windows with standard
    aggregates must compile to the shared-shuffle vectorized tier — ONE
    exchange feeding every window family — not one unioned
    groupBy(F.window) subplan (scan + shuffle) per family."""
    from scotty_window_processor_spark.functions import CountAggregation, SumAggregation
    from scotty_window_processor_spark.operators import TumblingWindow, WindowMeasure
    from scotty_window_processor_spark.plans.scotty_batch import scotty_window_aggregate

    ev = spark.read.parquet(f"{SF}/events.parquet")
    windows = [
        TumblingWindow(WindowMeasure.TIME, (i + 1) * 3_600_000, window_id=i)
        for i in range(16)
    ]
    aggs = [("n", "long", CountAggregation), ("sum_value", "double", SumAggregation)]

    out = scotty_window_aggregate(ev, key="user_id", ts="ts", value="value",
                                  windows=windows, aggs=aggs)
    plan = plan_of(out)
    assert plan.count("Exchange") == 1, plan
    assert "Union" not in plan

    # 2-3 windows keep the pure-Catalyst tier (whole-stage codegen)
    few = scotty_window_aggregate(ev, key="user_id", ts="ts", value="value",
                                  windows=windows[:2], aggs=aggs)
    assert "ArrowEvalPython" not in plan_of(few)
    assert "FlatMapsInPandas" not in plan_of(few)


def test_many_windows_tier_matches_catalyst_rows(spark):
    """The tier switch must be invisible in the output: 16-window shared
    shuffle rows == the same request forced through the Catalyst tier."""
    from scotty_window_processor_spark.functions import CountAggregation, SumAggregation
    from scotty_window_processor_spark.operators import TumblingWindow, WindowMeasure
    from scotty_window_processor_spark.plans import scotty_batch as sb

    ev = spark.read.parquet(f"{SF}/events.parquet")
    windows = [
        TumblingWindow(WindowMeasure.TIME, (i + 1) * 3_600_000, window_id=i)
        for i in range(5)
    ]
    aggs = [("n", "long", CountAggregation), ("sum_value", "double", SumAggregation)]

    fast = sb.scotty_window_aggregate(ev, key="user_id", ts="ts", value="value",
                                      windows=windows, aggs=aggs)
    # force the Catalyst union plan for comparison: 3 window families at a
    # time stay under the threshold
    parts = [
        sb.scotty_window_aggregate(ev, key="user_id", ts="ts", value="value",
                                   windows=[w], aggs=aggs)
        for w in windows
    ]
    slow = parts[0]
    for p in parts[1:]:
        slow = slow.unionAll(p)

    def canon(df):
        return sorted(
            (r["user_id"], r["window_id"], r["w_start"], r["w_end"], r["n"],
             round(r["sum_value"], 6))
            for r in df.collect()
        )

    assert canon(fast) == canon(slow)


def test_quantified_cep_is_one_exchange_one_sort(spark):
    """match_pattern_quantified compiles the whole expansion family (CASE
    over the longest lead() span) into ONE window-function pass: one hash
    exchange on the key + one sort feed every expansion's predicate — no
    joins, no per-expansion subplans, whole-stage codegen around the
    CASE."""
    from scotty_window_processor_spark.plans.cep import match_pattern_quantified

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = match_pattern_quantified(
        ev, key="user_id", ts="ts",
        steps=[
            (lambda c: c["event_type"] == "view", 1, 1),
            (lambda c: c["event_type"] == "click", 1, 3),
            (lambda c: c["event_type"] == "purchase", 1, 1),
        ],
        step_cols=["event_type"], within_ms=7 * 86_400_000, tiebreak="event_id",
    )
    plan = plan_of(out)
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort") == 1, plan
    assert "Join" not in plan and "Union" not in plan
    # payload pruning: only the needed columns reach the scan
    assert "ReadSchema" in plan and "props" not in plan.split("ReadSchema")[1][:400]


def test_near_dup_bucket_cap_is_broadcast_anti_join(spark):
    """max_bucket_size prunes hot buckets with a BROADCAST anti-join —
    the big bucket table must not shuffle for the cap.

    Since r6 the candidate stage (bucket assignment → cap → self-join →
    distinct) is materialized eagerly inside embedding_near_dup, so the
    final query plan starts from the checkpointed pair RDD; the cap's
    join strategy is asserted on the candidate-generation subplan, built
    here exactly as embedding_near_dup builds it."""
    from pyspark.sql import functions as F

    from scotty_window_processor_spark.plans.dedup import materialize
    from scotty_window_processor_spark.plans.similarity import (
        signed_projection_buckets,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    buckets = materialize(
        signed_projection_buckets(emb, "vec_id", "embedding", 64, 10, 6)
    )
    hot = (
        buckets.groupBy("tbl", "bucket")
        .count()
        .where(F.col("count") > 50)
        .select("tbl", "bucket")
    )
    capped = buckets.join(F.broadcast(hot), ["tbl", "bucket"], "left_anti")
    plan = plan_of(capped)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the final near-dup plan must NOT re-run the projection UDF: it reads
    # the materialized candidates (the 4×-ArrowEvalPython regression shape)
    from scotty_window_processor_spark.plans.similarity import embedding_near_dup

    final = plan_of(embedding_near_dup(emb, max_bucket_size=50))
    assert "Scan ExistingRDD" in final, final


def test_unbounded_plus_cep_is_one_exchange_one_sort(spark):
    """match_pattern_plus (possessive MID+): row_number and the
    next-terminator min(struct) ride the SAME window sort — one exchange,
    one sort, no joins, no per-length expansion."""
    from scotty_window_processor_spark.plans.cep import match_pattern_plus

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = match_pattern_plus(
        ev, key="user_id", ts="ts",
        pre=lambda c: c["event_type"] == "view",
        plus=lambda c: c["event_type"] == "click",
        post=lambda c: c["event_type"] == "purchase",
        step_cols=["event_type"], within_ms=7 * 86_400_000, tiebreak="event_id",
    )
    plan = plan_of(out)
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort") == 1, plan
    assert "Join" not in plan
