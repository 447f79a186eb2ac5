"""Streaming exact deduplication — the stream-side twin of
plans/dedup.dedup_exact, for pipelines that must drop repeats at ingest
time instead of in a batch pass.

Built on Structured Streaming's ``dropDuplicatesWithinWatermark`` (the
watermark-TTL'd dedup state Spark added for exactly this shape), so the
engine keeps ONE state entry per distinct key seen within the lateness
horizon and evicts it when the event-time watermark passes
``event_ts + delay``:

- state size ∝ distinct keys per horizon, NOT stream length — the only
  bound that survives a 10^12-turn stream (an un-TTL'd ``dropDuplicates``
  accumulates forever);
- keys are hash-partitioned across executors by the dedup subset (the
  same shuffle any keyed stateful op pays — no extra exchange);
- kept rows are emitted immediately (dedup does not wait for the
  watermark; the watermark only schedules state eviction), so the
  operator adds no emission latency;
- with the RocksDB state-store provider the per-key entry is spilled off
  the JVM heap like every other stateful operator in this engine.

Choosing ``delay`` trades memory for recall: a duplicate arriving more
than ``delay`` after the watermark passed its first occurrence is
re-admitted. Corpus-wide first-wins semantics (the batch
``dedup_exact`` contract) need ``delay`` ≥ the stream's event-time span
— the configuration the ``stream_dedup_exact`` gate pins against the
batch SQL oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def stream_dedup_exact(
    stream: DataFrame,
    keys: Sequence[str],
    ts: str = "ts",
    delay: str = "365 days",
) -> DataFrame:
    """First-wins streaming dedup on ``keys`` with state TTL ``delay``.

    "First" is arrival order; replaying from a ts-ordered source (this
    repo's range-file replay harness) makes that event-time order, which
    is what gives the operator a batch-SQL oracle (row_number() = 1 per
    key ordered by ts)."""
    from .processor import apply_state_store_defaults

    apply_state_store_defaults(stream.sparkSession)
    return stream.withWatermark(ts, delay).dropDuplicatesWithinWatermark(list(keys))
