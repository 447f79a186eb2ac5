"""Structured Streaming stateful operator: the slicing kernel per key.

Pipeline shape (the Spark-native equivalent of the reference's
KeyedScottyWindowOperator, flink-connector/.../KeyedScottyWindowOperator.java:15-88):

    readStream → withWatermark("ts", delay)
      → groupBy(conv_id).applyInPandasWithState(handler)
      → exactly-once sink (streaming.sink)

Per micro-batch, each key's new rows arrive as one Arrow batch; the handler
restores the key's kernel from the Spark state store, feeds rows in
event-time order, advances the kernel watermark to Spark's current
event-time watermark, and emits the triggered windows. Spark's watermark
(`GroupState.getCurrentWatermarkMs`) replaces Flink's
`ctx.timerService().currentWatermark()`; state timeout cleans up idle keys.

State encoding: TYPED Arrow structs (streaming.state_codec) whenever the
function/window mix allows — scalars + array<struct> slices/sessions in
the state column, no Python object graph in the state store. Custom
lift/combine/lower functions and count-measure windows (which need raw
record buffers) keep the single pickled BinaryType cell — the same
eager/lazy footprint switch as the reference (SliceFactory.java:17-22),
made explicit by `typed_state_eligible`.
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, Iterator, List, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions import (
    AggregateFunction,
    CountAggregation,
    MaxAggregation,
    MeanAggregation,
    MinAggregation,
    SumAggregation,
)
from ..operators.kernel import SlicingWindowOperator
from ..operators.windows import Window, WindowMeasure

STATE_SCHEMA = "kernel binary"  # pickle fallback (custom fns / count windows)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def apply_state_store_defaults(spark) -> None:
    """Engine default: the RocksDB state-store provider. It won every r5
    measurement over the HDFS-backed default (BENCH/latency_floor.md:
    p99 −23%, wall −11% on the flagship probe; the r4/r5 scaling runs
    agree) because its per-batch commit writes a delta instead of the
    full-file checkpoint. Applied at query-build time and ONLY when the
    user has not picked a provider explicitly (conf unset), so
    deployments that configure their own provider are untouched."""
    key = "spark.sql.streaming.stateStore.providerClass"
    if not spark.conf.get(key, None):
        spark.conf.set(key, ROCKSDB_PROVIDER)

AggSpec = Tuple[str, str, Callable[[], AggregateFunction]]

_BULK_KINDS = {
    SumAggregation: "sum",
    CountAggregation: "count",
    MinAggregation: "min",
    MaxAggregation: "max",
    MeanAggregation: "mean",
}


def _bulk_kinds(aggs: Sequence[AggSpec]) -> list[str] | None:
    """numpy lift kinds for the vectorized in-order path, or None if any
    function needs the generic lift/combine path."""
    kinds = []
    for _, _, factory in aggs:
        k = _BULK_KINDS.get(type(factory()))
        if k is None:
            return None
        kinds.append(k)
    return kinds


def _feed_kinds(aggs: Sequence[AggSpec], value_col) -> list | None:
    """Segment-lift spec for feed_sorted_batch, one entry per function: a
    numpy-reduction NAME for the standard aggregates, or the function's
    own ``bulk_lift_values`` callable for custom functions that declare
    one (quantile histograms, payload tallies — same contract as the
    batch tier, plans/scotty_batch._bulk_lift_kinds). None routes the key
    through the exact per-element loop. Broader than _bulk_kinds: the
    TYPED state codec still requires all-standard functions, but the
    in-order bulk feed only needs segment associativity."""
    if value_col is None:
        return None
    kinds = []
    for _, _, factory in aggs:
        fn = factory()
        named = _BULK_KINDS.get(type(fn))
        if named is not None:
            kinds.append(named)
        elif fn.bulk_lift_values is not None:
            kinds.append(fn.bulk_lift_values)
        else:
            return None
    return kinds


def feed_sorted_batch(
    op: SlicingWindowOperator, elements, ts_ms, bulk_kinds, min_bulk_custom: int = 64
) -> None:
    """Feed one ts-sorted micro-batch into a kernel: the out-of-order
    prefix (before the operator's event-time frontier) takes the exact
    per-element surgery path, the in-order suffix takes the vectorized
    bulk path (the reference's StreamSlicer.java:50-51 in-order branch,
    in segment form). Falls back to the per-element loop when the
    function/window mix is not numpy-reducible — and, for CUSTOM segment
    lifts (callable kinds), when the key's batch is shorter than
    ``min_bulk_custom``: an np.unique/Counter per near-empty segment
    costs more than a handful of per-element merges (measured 2× slower
    on the replay gate's ~5-row key-batches), while the named numpy
    reductions stay cheap at any size."""
    if (
        bulk_kinds is not None
        and op.bulk_eligible()
        and not (len(ts_ms) < min_bulk_custom and any(callable(k) for k in bulk_kinds))
    ):
        import numpy as np

        frontier = op._max_event_time
        split = int(np.searchsorted(ts_ms, max(frontier, ts_ms[0]), side="left"))
        for j in range(split):
            op.process_element(elements[j], int(ts_ms[j]))
        op.process_in_order_bulk(elements[split:], ts_ms[split:], bulk_kinds)
    else:
        for element, t in zip(elements, ts_ms.tolist()):
            op.process_element(element, int(t))


def output_schema(key_name: str, key_type: T.DataType, aggs: Sequence[AggSpec]) -> T.StructType:
    return T.StructType(
        [
            T.StructField(key_name, key_type, True),
            T.StructField("window_id", T.LongType(), False),
            T.StructField("measure", T.StringType(), False),
            T.StructField("w_start", T.LongType(), False),
            T.StructField("w_end", T.LongType(), False),
            T.StructField("emit_ts", T.LongType(), False),
        ]
        + [T.StructField(name, T._parse_datatype_string(ddl), True) for name, ddl, _ in aggs]
    )


def typed_state_eligible(windows: Sequence[Window], aggs: Sequence[AggSpec], value_col) -> bool:
    """Typed (Arrow-struct) state covers time-measure windows with
    numpy-reducible functions over a value column — the hot path. Count
    windows (per-slice record buffers) and custom lift/combine/lower
    partials keep the pickled-kernel state cell, explicitly."""
    return (
        value_col is not None
        and _bulk_kinds(aggs) is not None
        and all(w.measure == WindowMeasure.TIME for w in windows)
    )


def typed_state_schema(n_fns: int) -> T.StructType:
    from .state_codec import SCALARS_DDL, SESSION_DDL, slice_ddl

    return T.StructType(
        [
            T.StructField("scalars", T._parse_datatype_string(SCALARS_DDL)),
            T.StructField("sessions", T.ArrayType(T._parse_datatype_string(SESSION_DDL))),
            T.StructField("slices", T.ArrayType(T._parse_datatype_string(slice_ddl(n_fns)))),
        ]
    )


def make_handler(
    key_name: str,
    ts_col: str,
    value_col: str | None,
    windows: Sequence[Window],
    aggs: Sequence[AggSpec],
    lateness_ms: int,
    out_fields: List[str],
    window_registry: str | None = None,
    registry_poll_s: float = 10.0,
):
    """Build the applyInPandasWithState handler (pure function of config —
    shippable to executors via --py-files). With `window_registry`, the
    handler also merges the registry file's windows into every kernel it
    touches — the live mid-stream addWindow path (streaming.registry)."""
    from .state_codec import decode_op, encode_op

    window_defs = list(windows)
    agg_specs = list(aggs)

    bulk_kinds = _bulk_kinds(agg_specs) if value_col is not None else None
    feed_kinds = _feed_kinds(agg_specs, value_col)
    typed = typed_state_eligible(window_defs, agg_specs, value_col)

    def new_op(extra: Sequence[Window]) -> SlicingWindowOperator:
        op = SlicingWindowOperator(max_lateness=lateness_ms)
        for _, _, factory in agg_specs:
            op.add_aggregation(factory())
        # registry windows strictly AFTER the base list: the typed state
        # codec indexes session contexts positionally, and the registry is
        # append-only, so this keeps every previously-encoded ctx_idx valid
        for w in window_defs:
            op.add_window(w)
        for w in extra:
            op.add_window(w)
        return op

    def handler(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # Invoked when this key has new rows OR its event-time timer fired
        # (hasTimedOut): the timer is how watermark-only progress reaches
        # keys with no fresh data — the reference instead loops over all
        # keys on every watermark advance (KeyedScottyWindowOperator
        # .java:65-78), which a distributed state store cannot do.
        if window_registry is not None:
            from .registry import read_registry

            base_ids = {w.window_id for w in window_defs}
            dyn = [w for w in read_registry(window_registry, registry_poll_s)
                   if w.window_id not in base_ids]
        else:
            dyn = []
        op = new_op(dyn)
        if state.exists:
            if typed:
                scalars, sessions, slices = state.get
                try:
                    decode_op(op, bulk_kinds, scalars, sessions, slices)
                except IndexError:
                    # stale registry cache race: this state was encoded by
                    # a worker that had already picked up a newly added
                    # SessionWindow (positional ctx_idx beyond our context
                    # list). Force a registry refresh (poll 0) and retry
                    # instead of failing the task for up to poll_interval.
                    if window_registry is None:
                        raise
                    from .registry import read_registry as _rr

                    dyn = [w for w in _rr(window_registry, 0.0)
                           if w.window_id not in base_ids]
                    op = new_op(dyn)
                    decode_op(op, bulk_kinds, scalars, sessions, slices)
            else:
                op = pickle.loads(state.get[0])
                known = op.registered_window_ids
                for w in dyn:
                    if w.window_id not in known:
                        op.add_window(w)

        import time as _time

        emit_ms = int(_time.time() * 1000)
        # Materialize the key's WHOLE micro-batch before sorting: Spark
        # delivers a large group as MULTIPLE Arrow chunks in arrival order
        # (bounded by arrow.maxRecordsPerBatch), so sorting/seeding per
        # chunk would treat a later chunk's earlier timestamps as
        # beyond-watermark late data on the key's first batch (dropped)
        # and out-of-order surgery the single sort avoids.
        parts = [p for p in pdfs if not p.empty]
        if parts:
            pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            ts_ms = pdf[ts_col].to_numpy().astype("datetime64[ms]").astype("int64")
            op.seed_watermark(int(ts_ms[0]) - 1)  # no-op after first batch
            if value_col is not None:
                elements = pdf[value_col].to_numpy()
            else:
                elements = pdf.to_dict("records")

            feed_sorted_batch(op, elements, ts_ms, feed_kinds)

        wm = state.getCurrentWatermarkMs()
        rows = []
        if wm > 0:
            results = op.process_watermark(wm)
            fns = [factory() for _, _, factory in agg_specs]
            for w in results:
                if not w.has_value:
                    continue
                vals = [
                    fns[i].lower(w.agg_state.partials[i]) if w.agg_state.present[i] else None
                    for i in range(len(fns))
                ]
                rows.append([key[0], w.window_id, w.measure.value, w.start, w.end, emit_ms, *vals])

        nxt = op.next_emission_ts()
        if (nxt is None and op.store.is_empty and not op.has_count_measure) or op.quiesced(wm):
            # nothing pending — or the kernel is QUIESCED: only the open
            # slice remains and it is past every window horizon, so the key
            # can never emit again without new input. Dropping the state
            # cell here keeps the store ∝ active keys, not ever-seen keys
            # (and stops the idle key's timer from re-arming forever).
            state.remove()
        else:
            if typed:
                state.update(encode_op(op, bulk_kinds))
            else:
                state.update((pickle.dumps(op),))
            # wake when the watermark passes the next possible emission
            state.setTimeoutTimestamp(max(nxt if nxt is not None else wm + 1, wm + 1))

        if rows:
            yield pd.DataFrame(rows, columns=out_fields)

    return handler


def scotty_stream(
    stream_df: DataFrame,
    key: str,
    ts: str,
    value: str | None,
    windows: Sequence[Window],
    aggs: Sequence[AggSpec],
    watermark_delay: str = "30 seconds",
    lateness_ms: int = 30_000,
    window_registry: str | None = None,
    registry_poll_s: float = 10.0,
) -> DataFrame:
    """Streaming windowed aggregation with slice sharing across all
    `windows`. Returns the streaming result DataFrame (attach a sink with
    streaming.sink.exactly_once_parquet_sink or .writeStream).

    `window_registry` names a control file (streaming.registry) whose
    TIME-measure windows are merged into every key's kernel at runtime —
    `registry_add_window(path, w)` adds a window to the RUNNING query
    (the reference's live addWindow, WindowManager.java:124-143), no
    restart or state loss; executors re-stat the file at most every
    `registry_poll_s` seconds."""
    apply_state_store_defaults(stream_df.sparkSession)
    if value is not None:
        # column-prune BEFORE the state shuffle: in value mode the handler
        # reads only (key, ts, value), so payload columns (transcript text
        # etc.) must not cross the shuffle or the Arrow boundary — and the
        # select pushes the pruning all the way into the source scan
        stream_df = stream_df.select(*dict.fromkeys([key, ts, value]))
    key_field = stream_df.schema[key]
    schema = output_schema(key, key_field.dataType, aggs)
    handler = make_handler(
        key, ts, value, windows, aggs, lateness_ms, [f.name for f in schema.fields],
        window_registry=window_registry, registry_poll_s=registry_poll_s,
    )
    state_schema = (
        typed_state_schema(len(aggs))
        if typed_state_eligible(windows, aggs, value)
        else STATE_SCHEMA
    )
    return (
        stream_df.withWatermark(ts, watermark_delay)
        .groupBy(key)
        .applyInPandasWithState(
            handler,
            outputStructType=schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def scotty_stream_global(
    stream_df: DataFrame,
    ts: str,
    value: str | None,
    windows: Sequence[Window],
    aggs: Sequence[AggSpec],
    watermark_delay: str = "30 seconds",
    lateness_ms: int = 30_000,
) -> DataFrame:
    """Non-keyed streaming aggregation — the GlobalScottyWindowOperator
    analogue (flink-connector/.../GlobalScottyWindowOperator.java:15-71):
    every element flows through ONE slicing kernel via a constant grouping
    key. Exactly like the reference's operator (a single ProcessFunction
    instance), global state lives on one task; for high-rate global
    windows with associative functions prefer the keyed operator plus a
    downstream window-level combine."""
    tagged = stream_df.withColumn("_g", F.lit(1))
    return scotty_stream(
        tagged, "_g", ts, value, windows, aggs, watermark_delay, lateness_ms
    ).drop("_g")
