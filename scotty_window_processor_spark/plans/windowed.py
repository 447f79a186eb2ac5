"""Catalyst-native windowed aggregation (tumbling / sliding / session / count).

These are the idiomatic-Spark expressions of the reference's window
semantics (core/.../windowType/{Tumbling,Sliding,Session}Window.java) for
the batch path: `F.window` / `F.session_window` compile to built-in
Expand + HashAggregate plans (whole-stage codegen, partial aggregation
before the shuffle, AQE-coalesced partitions) and scale linearly.

The slicing kernel (plans.scotty_batch / streaming.processor) exists for
what these CANNOT do: share one slice store across many concurrent
windows, count-measure windows, and multi-gap session sets. For a single
window definition the built-ins are the fastest plan Spark can produce,
so the engine routes single-window queries here.

All window bounds are emitted as epoch milliseconds (BIGINT) so results
hash-compare exactly against ANSI-SQL oracles.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _epoch_ms(col: Column) -> Column:
    # cast handles timestamp_ntz inputs; callers pin session tz to UTC so
    # the ntz wall clock is the UTC instant (matching DuckDB's epoch_ms)
    return F.unix_millis(col.cast("timestamp"))


def tumbling_aggregate(df: DataFrame, key: str, ts: str, size: str, aggs: Dict[str, Column]) -> DataFrame:
    """Per-key tumbling windows of `size` (e.g. '1 hour'); epoch-aligned."""
    w = F.window(F.col(ts), size)
    return (
        df.groupBy(F.col(key), w.alias("w"))
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            F.col(key),
            _epoch_ms(F.col("w.start")).alias("w_start"),
            _epoch_ms(F.col("w.end")).alias("w_end"),
            *[F.col(n) for n in aggs],
        )
    )


def sliding_aggregate(df: DataFrame, key: str, ts: str, size: str, slide: str, aggs: Dict[str, Column]) -> DataFrame:
    """Per-key sliding windows; each row expands into size/slide windows
    (Catalyst `Expand`), then one hash aggregate — the bucket-per-window
    strategy. The slicing kernel replaces this when many concurrent
    windows share slices."""
    w = F.window(F.col(ts), size, slide)
    return (
        df.groupBy(F.col(key), w.alias("w"))
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            F.col(key),
            _epoch_ms(F.col("w.start")).alias("w_start"),
            _epoch_ms(F.col("w.end")).alias("w_end"),
            *[F.col(n) for n in aggs],
        )
    )


def session_aggregate(df: DataFrame, key: str, ts: str, gap: str, aggs: Dict[str, Column]) -> DataFrame:
    """Per-key gap sessions via the built-in session_window (merging
    aggregate); session end = last event ts + gap, matching the
    reference's SessionWindow trigger (SessionWindow.java:118-133)."""
    w = F.session_window(F.col(ts), gap)
    return (
        df.groupBy(F.col(key), w.alias("w"))
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            F.col(key),
            _epoch_ms(F.col("w.start")).alias("w_start"),
            _epoch_ms(F.col("w.end")).alias("w_end"),
            *[F.col(n) for n in aggs],
        )
    )


def count_tumbling_aggregate(df: DataFrame, key: str, ts: str, n: int, aggs: Dict[str, Column],
                             tiebreak: str, complete_only: bool = True) -> DataFrame:
    """Count-measure tumbling windows: every `n` records per key in event-time
    order. No Spark built-in exists; expressed as row_number bucketing —
    a single shuffle by key, no Python. Scotty emits only windows whose
    end count the watermark passed, i.e. complete groups
    (WindowManager.java:105-119) — `complete_only` mirrors that.

    `tiebreak` must be a deterministic unique column (same-ts ordering
    must match the SQL oracle exactly)."""
    rn = F.row_number().over(W.partitionBy(key).orderBy(ts, tiebreak)) - 1
    with_bucket = (
        df.withColumn("rn", rn)
        .withColumn("c_start", (F.col("rn") - F.col("rn") % n).cast("long"))
    )
    out = (
        with_bucket.groupBy(key, "c_start")
        .agg(F.count(F.lit(1)).alias("_n"), *[c.alias(nm) for nm, c in aggs.items()])
        .select(
            F.col(key),
            F.col("c_start"),
            (F.col("c_start") + n).alias("c_end"),
            F.col("_n"),
            *[F.col(nm) for nm in aggs],
        )
    )
    if complete_only:
        out = out.where(F.col("_n") == n)
    return out.drop("_n")
