"""Pure-unit coverage for the transformWithStateInPandas tier's timer and
state sequencing (streaming/tws.py ScottyStatefulProcessor), driven against
mocked ListState/ValueState/handle/timer objects.

The real API cannot run in this container (its state-server protocol needs
the protobuf package — tests/test_streaming_tws.py documents the waiver),
so these tests pin the processor's OWN logic: timer registration /
dedup / expiry bookkeeping in ``_finish`` and ``handleExpiredTimer``,
emission on watermark, and end-of-life state clearing. The mocks implement
exactly the surface the processor calls, matching the pyspark
StatefulProcessorHandle/ListState/ValueState/TimerValues contracts."""

import numpy as np
import pandas as pd
import pytest

from scotty_window_processor_spark.functions import CountAggregation, SumAggregation
from scotty_window_processor_spark.operators import TumblingWindow, WindowMeasure
from scotty_window_processor_spark.streaming.tws import ScottyStatefulProcessor

HOUR = 3_600_000


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeListState:
    def __init__(self):
        self._rows = []

    def get(self):
        return iter(self._rows)

    def put(self, rows):
        self._rows = list(rows)

    def clear(self):
        self._rows = []


class FakeHandle:
    def __init__(self):
        self._states = {}
        self.timers = set()
        self.register_calls = []
        self.delete_calls = []

    def getListState(self, name, schema):
        return self._states.setdefault(name, FakeListState())

    def getValueState(self, name, schema):
        return self._states.setdefault(name, FakeValueState())

    def registerTimer(self, ts):
        self.timers.add(ts)
        self.register_calls.append(ts)

    def deleteTimer(self, ts):
        self.timers.discard(ts)
        self.delete_calls.append(ts)


class FakeTimerValues:
    def __init__(self, wm):
        self._wm = wm

    def getCurrentWatermarkInMs(self):
        return self._wm

    def getCurrentProcessingTimeInMs(self):
        return 0


class FakeExpiredTimerInfo:
    def __init__(self, ts):
        self._ts = ts

    def getExpiryTimeInMs(self):
        return self._ts


def make_proc(windows=None):
    proc = ScottyStatefulProcessor(
        key_name="user_id",
        ts_col="ts",
        value_col="value",
        windows=windows or [TumblingWindow(WindowMeasure.TIME, HOUR, window_id=1)],
        aggs=[("n", "long", CountAggregation), ("sum_value", "double", SumAggregation)],
        lateness_ms=30_000,
        out_fields=["user_id", "window_id", "measure", "w_start", "w_end", "emit_ts", "n", "sum_value"],
    )
    handle = FakeHandle()
    proc.init(handle)
    return proc, handle


def events(ts_ms, values):
    return pd.DataFrame(
        {"ts": pd.to_datetime(np.asarray(ts_ms, dtype="int64"), unit="ms"),
         "value": np.asarray(values, dtype="float64")}
    )


def feed(proc, ts_ms, values, wm):
    return list(
        proc.handleInputRows(("u1",), iter([events(ts_ms, values)]),
                             FakeTimerValues(wm))
    )


def fire(proc, wm, expired_ts):
    # the real runtime consumes a timer when it fires — model that, so the
    # processor's "don't deleteTimer(expired)" logic is what's under test
    proc.handle.timers.discard(expired_ts)
    return list(
        proc.handleExpiredTimer(("u1",), FakeTimerValues(wm),
                                FakeExpiredTimerInfo(expired_ts))
    )


def test_input_registers_timer_no_premature_emission():
    proc, handle = make_proc()
    out = feed(proc, [600_000, 1_200_000, HOUR + 600_000], [1.0, 2.0, 4.0], wm=0)
    assert out == []                       # watermark 0: nothing finalized
    assert handle.register_calls == [HOUR]  # wake at the first window end
    assert handle.timers == {HOUR}
    assert proc.op_state.exists()


def test_timer_dedup_no_churn_when_unchanged():
    proc, handle = make_proc()
    feed(proc, [600_000], [1.0], wm=0)
    feed(proc, [1_200_000], [2.0], wm=0)   # same window, same next emission
    assert handle.register_calls == [HOUR]  # registered once, not re-armed
    assert handle.delete_calls == []


def test_expired_timer_emits_and_rearms_without_deleting_expired():
    proc, handle = make_proc()
    feed(proc, [600_000, 1_200_000, HOUR + 600_000], [1.0, 2.0, 4.0], wm=0)
    out = fire(proc, wm=HOUR + 1, expired_ts=HOUR)
    rows = out[0]
    assert len(rows) == 1
    r = rows.iloc[0]
    assert (r["w_start"], r["w_end"], r["n"], r["sum_value"]) == (0, HOUR, 2, 3.0)
    # the fired timer is ALREADY consumed by the runtime: the processor must
    # not deleteTimer(expired) — only register the next wake
    assert HOUR not in handle.delete_calls
    assert handle.register_calls == [HOUR, 2 * HOUR]
    assert handle.timers == {2 * HOUR}


def test_rearm_replaces_stale_timer_from_input_path():
    """When the next emission moves (window flushed by the input-path
    watermark, new data opens a later window) the processor must delete
    the stale timer before registering the new one — the != dedup only
    skips exact matches."""
    proc, handle = make_proc()
    feed(proc, [600_000], [1.0], wm=0)              # next emission: 1 HOUR
    assert handle.register_calls == [HOUR]
    # watermark advanced on the input path: [0,1H) flushes here and the
    # next wake moves to the next slice edge past the watermark (2 HOUR)
    out = feed(proc, [5 * HOUR + 600_000], [2.0], wm=HOUR + 1)
    assert len(out) == 1 and len(out[0]) == 1
    assert handle.delete_calls == [HOUR]
    assert handle.register_calls == [HOUR, 2 * HOUR]
    assert handle.timers == {2 * HOUR}


def test_final_drain_clears_state_and_timer():
    proc, handle = make_proc()
    feed(proc, [600_000, 1_200_000, HOUR + 600_000], [1.0, 2.0, 4.0], wm=0)
    fire(proc, wm=HOUR + 1, expired_ts=HOUR)
    out = fire(proc, wm=10 * HOUR, expired_ts=2 * HOUR)
    rows = out[0]
    assert len(rows) == 1
    r = rows.iloc[0]
    assert (r["w_start"], r["w_end"], r["n"], r["sum_value"]) == (HOUR, 2 * HOUR, 1, 4.0)
    # everything flushed: state rows, scalar cell, and timers all cleared
    assert not proc.op_state.exists()
    assert list(proc.slices.get()) == []
    assert list(proc.sessions.get()) == []
    assert handle.timers == set()


def test_expired_timer_after_clear_is_a_noop():
    proc, handle = make_proc()
    feed(proc, [600_000], [1.0], wm=0)
    fire(proc, wm=10 * HOUR, expired_ts=HOUR)       # drains + clears
    assert not proc.op_state.exists()
    out = fire(proc, wm=11 * HOUR, expired_ts=2 * HOUR)  # straggler timer
    assert out == []
    assert not proc.op_state.exists()


def test_emission_parity_with_direct_kernel():
    """Rows emitted across input/timer calls equal one kernel run over the
    same elements — the typed round-trip + timer scheduling lose nothing."""
    from scotty_window_processor_spark.operators.kernel import SlicingWindowOperator

    ts = [200_000, 700_000, HOUR - 1, HOUR + 5, 2 * HOUR + 9, 3 * HOUR - 7]
    vals = [1.0, 2.0, 3.0, 5.0, 7.0, 11.0]

    proc, handle = make_proc()
    got = []
    got += feed(proc, ts[:3], vals[:3], wm=0)
    got += fire(proc, wm=HOUR + 30_000, expired_ts=HOUR)
    got += feed(proc, ts[3:], vals[3:], wm=HOUR + 30_000)
    got += fire(proc, wm=100 * HOUR, expired_ts=2 * HOUR)
    got_rows = sorted(
        (int(r["w_start"]), int(r["w_end"]), int(r["n"]), float(r["sum_value"]))
        for pdf in got for _, r in pdf.iterrows()
    )

    op = SlicingWindowOperator(max_lateness=30_000)
    op.add_aggregation(CountAggregation())
    op.add_aggregation(SumAggregation())
    op.add_window(TumblingWindow(WindowMeasure.TIME, HOUR, window_id=1))
    op.seed_watermark(ts[0] - 1)
    for t, v in zip(ts, vals):
        op.process_element(v, t)
    fns = [CountAggregation(), SumAggregation()]
    want = sorted(
        (w.start, w.end, fns[0].lower(w.agg_state.partials[0]),
         float(fns[1].lower(w.agg_state.partials[1])))
        for w in op.process_watermark(100 * HOUR) if w.has_value
    )
    assert got_rows == want
