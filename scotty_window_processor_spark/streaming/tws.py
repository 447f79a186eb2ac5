"""Typed-state streaming operator: transformWithStateInPandas (Spark 4).

EXPERIMENTAL: this tier has never executed in the build container (the
transformWithStateInPandas state-server protocol requires the ``protobuf``
package, absent here), so the timer bookkeeping in ``_finish`` /
``handleExpiredTimer`` ships code-complete but runtime-unverified; only
the shared state codec is exercised (via the applyInPandasWithState
operator). Run ``tests/test_streaming_tws.py`` on an environment with
protobuf before relying on ``scotty_stream_typed`` in production.

The applyInPandasWithState path (streaming.processor) pickles the whole
kernel object into one binary state cell — simple, but CPU-heavy and
version-fragile at 10^9 keys (SURVEY hard-part #5). This operator keeps
the SAME slicing kernel but stores its state as TYPED Arrow structs in
the Spark state store:

- ``slices``   ListState — one row per slice: boundary timestamps, count
  bounds, edge type, and one (value, count, set) triple per aggregate
  function (the lift/combine partial, columnar).
- ``sessions`` ListState — one row per active session window
  (ctx_idx, start, end), ordered.
- ``op``       ValueState — the scalar slicer state (lastWatermark,
  counts, max event time, next-edge bookkeeping, registered timer).

Per micro-batch the kernel is rebuilt from these rows (cheap: slices per
key are bounded by the window horizon + eviction), fed through the same
vectorized in-order path as the pickle operator, and written back
columnar. No Python object graph ever touches the state store, so state
survives code upgrades and stays byte-comparable across restarts.

Supported surface: the numpy-reducible functions (sum/count/min/max/mean)
over time-measure windows — the 100 TB hot path. Count-measure windows
(need per-slice record buffers) and custom lift/combine/lower functions
route through the pickle-state operator instead; scotty_stream_typed
raises for those so the caller chooses explicitly.

Reference parity: the operator semantics are KeyedScottyWindowOperator
(flink-connector/.../KeyedScottyWindowOperator.java:15-88); state layout
is original (the reference keeps Java object state in Flink managed
memory).

Note: transformWithStateInPandas requires the RocksDB state store
provider (set spark.sql.streaming.stateStore.providerClass to
RocksDBStateStoreProvider).
"""

from __future__ import annotations

from typing import Any, Iterator, List, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from ..operators.kernel import SlicingWindowOperator
from ..operators.windows import Window
from .processor import AggSpec, _bulk_kinds, feed_sorted_batch, output_schema
from .state_codec import SCALARS_DDL, SESSION_DDL, decode_op, encode_op, slice_ddl

_OP_SCHEMA = SCALARS_DDL + ", timer_ts long"

ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


class ScottyStatefulProcessor(StatefulProcessor):
    """One slicing kernel per key, stored columnar (see module doc)."""

    def __init__(self, key_name, ts_col, value_col, windows, aggs, lateness_ms, out_fields):
        self.key_name = key_name
        self.ts_col = ts_col
        self.value_col = value_col
        self.window_defs: List[Window] = list(windows)
        self.agg_specs: List[AggSpec] = list(aggs)
        self.lateness_ms = lateness_ms
        self.out_fields = out_fields
        self.kinds = _bulk_kinds(self.agg_specs)
        if self.kinds is None:
            raise ValueError(
                "typed-state operator supports sum/count/min/max/mean; "
                "use scotty_stream (pickle-state kernel) for custom functions"
            )
        from ..operators.windows import WindowMeasure

        if any(w.measure == WindowMeasure.COUNT for w in self.window_defs):
            raise ValueError(
                "typed-state operator cannot encode count-measure windows "
                "(their slices carry record buffers for the positional "
                "ripple); use scotty_stream (pickle-state kernel) instead"
            )

    # -- StatefulProcessor contract -----------------------------------------
    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.slices = handle.getListState("slices", slice_ddl(len(self.agg_specs)))
        self.sessions = handle.getListState("sessions", SESSION_DDL)
        self.op_state = handle.getValueState("op", _OP_SCHEMA)

    def close(self) -> None:
        pass

    # -- kernel <-> typed state ---------------------------------------------
    def _new_op(self) -> SlicingWindowOperator:
        op = SlicingWindowOperator(max_lateness=self.lateness_ms)
        for _, _, factory in self.agg_specs:
            op.add_aggregation(factory())
        for w in self.window_defs:
            op.add_window(w)
        return op

    def _restore(self) -> tuple[SlicingWindowOperator, int]:
        op = self._new_op()
        scal = self.op_state.get() if self.op_state.exists() else None
        if scal is None:
            return op, -1
        timer_ts = scal[-1]
        decode_op(op, self.kinds, tuple(scal[:-1]), list(self.sessions.get()),
                  list(self.slices.get()))
        return op, timer_ts

    def _save(self, op: SlicingWindowOperator, timer_ts: int) -> None:
        scalars, sess_rows, rows = encode_op(op, self.kinds)
        self.op_state.update((*scalars, timer_ts))
        if sess_rows:
            self.sessions.put(sess_rows)
        else:
            self.sessions.clear()
        if rows:
            self.slices.put(rows)
        else:
            self.slices.clear()

    def _clear(self, timer_ts: int) -> None:
        self.slices.clear()
        self.sessions.clear()
        self.op_state.clear()
        if timer_ts >= 0:
            self.handle.deleteTimer(timer_ts)

    # -- emission --------------------------------------------------------------
    def _emit(self, op: SlicingWindowOperator, key, wm: int, emit_ms: int):
        rows = []
        if wm > 0:
            fns = [factory() for _, _, factory in self.agg_specs]
            for w in op.process_watermark(wm):
                if not w.has_value:
                    continue
                vals = [
                    fns[i].lower(w.agg_state.partials[i]) if w.agg_state.present[i] else None
                    for i in range(len(fns))
                ]
                rows.append([key, w.window_id, w.measure.value, w.start, w.end, emit_ms, *vals])
        return rows

    def _finish(self, op: SlicingWindowOperator, old_timer: int, wm: int):
        nxt = op.next_emission_ts()
        if (nxt is None and op.store.is_empty) or op.quiesced(wm):
            # count windows can't reach here (rejected in __init__), so the
            # quiesce check mirrors streaming.processor: a kernel whose only
            # remaining slice is past every window horizon is dead state
            self._clear(old_timer)
            return
        new_timer = max(nxt if nxt is not None else wm + 1, wm + 1)
        if new_timer != old_timer:
            if old_timer >= 0:
                self.handle.deleteTimer(old_timer)
            self.handle.registerTimer(new_timer)
        self._save(op, new_timer)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        import time as _time

        op, old_timer = self._restore()
        emit_ms = int(_time.time() * 1000)
        for pdf in rows:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(self.ts_col, kind="mergesort")
            ts_ms = pdf[self.ts_col].to_numpy().astype("datetime64[ms]").astype("int64")
            op.seed_watermark(int(ts_ms[0]) - 1)  # no-op once restored
            feed_sorted_batch(op, pdf[self.value_col].to_numpy(), ts_ms, self.kinds)
        wm = timerValues.getCurrentWatermarkInMs()
        out = self._emit(op, key[0], wm, emit_ms)
        self._finish(op, old_timer, wm)
        if out:
            yield pd.DataFrame(out, columns=self.out_fields)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        import time as _time

        op, old_timer = self._restore()
        if not self.op_state.exists():
            return
        wm = timerValues.getCurrentWatermarkInMs()
        out = self._emit(op, key[0], wm, int(_time.time() * 1000))
        expired = expiredTimerInfo.getExpiryTimeInMs()
        self._finish(op, old_timer if old_timer != expired else -1, wm)
        if out:
            yield pd.DataFrame(out, columns=self.out_fields)


def scotty_stream_typed(
    stream_df: DataFrame,
    key: str,
    ts: str,
    value: str,
    windows: Sequence[Window],
    aggs: Sequence[AggSpec],
    watermark_delay: str = "30 seconds",
    lateness_ms: int = 30_000,
) -> DataFrame:
    """Streaming slicing aggregation with TYPED (Arrow-struct) state —
    the transformWithStateInPandas tier. Same output schema and rows as
    scotty_stream; state is columnar instead of pickled."""
    key_field = stream_df.schema[key]
    schema = output_schema(key, key_field.dataType, aggs)
    proc = ScottyStatefulProcessor(
        key, ts, value, windows, aggs, lateness_ms, [f.name for f in schema.fields]
    )
    return (
        stream_df.withWatermark(ts, watermark_delay)
        .groupBy(key)
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=schema,
            outputMode="append",
            timeMode="eventtime",
        )
    )
