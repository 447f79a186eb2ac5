"""Randomized differential tests: kernel vs brute-force recompute-per-window.

The brute-force oracle recomputes every emitted window directly from the
raw (value, ts) element list — no slicing, no sharing. Seeded streams cover
in-order and bounded out-of-order arrivals (within max_lateness of the
running max event time, i.e. the regime Scotty guarantees exact results
for; see WindowManager.java:24 maxLateness and the SliceManager
out-of-order path).
"""

import random

import pytest

from scotty_window_processor_spark.functions import (
    MaxAggregation,
    MinAggregation,
    SumAggregation,
)
from scotty_window_processor_spark.operators import (
    SessionWindow,
    SlicingWindowOperator,
    SlidingWindow,
    TumblingWindow,
    WindowMeasure,
)


def gen_stream(seed, n, disorder, max_gap=40, lateness=1000):
    """Seeded stream of (value, ts); a `disorder` fraction of elements is
    shifted back by up to `lateness/2` (bounded out-of-order)."""
    rng = random.Random(seed)
    ts = 0
    out = []
    for _ in range(n):
        ts += rng.randint(1, max_gap)
        out.append((rng.randint(1, 100), ts))
    if disorder:
        first_ts = out[0][1]
        for i in range(1, n):
            if rng.random() < disorder:
                shift = rng.randint(1, lateness // 2)
                v, t = out[i]
                # clamp: never earlier than the very first record — records
                # preceding the first slice are routed to slice 0 without
                # count ripple (reference SliceManager.java:75-79), which no
                # per-window recompute oracle can reproduce
                out[i] = (v, max(first_ts, t - shift))
    return out


def run_kernel(stream, windows, functions, watermarks):
    op = SlicingWindowOperator()
    for fn in functions:
        op.add_aggregation(fn)
    for w in windows:
        op.add_window(w)
    results = []
    for v, ts in stream:
        op.process_element(v, ts)
    for wm in watermarks:
        results.extend(op.process_watermark(wm))
    return results


def brute_force_value(stream, start, end, fn):
    vals = [v for v, ts in stream if start <= ts < end]
    if not vals:
        return None
    acc = fn.lift(vals[0])
    for v in vals[1:]:
        acc = fn.lift_and_combine(acc, v)
    return fn.lower(acc)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("disorder", [0.0, 0.15])
def test_tumbling_sliding_shared_vs_bruteforce(seed, disorder):
    stream = gen_stream(seed, 300, disorder)
    functions = [SumAggregation(), MinAggregation(), MaxAggregation()]
    windows = [
        TumblingWindow(WindowMeasure.TIME, 100),
        TumblingWindow(WindowMeasure.TIME, 250),
        SlidingWindow(WindowMeasure.TIME, 200, 50),
    ]
    final_wm = max(ts for _, ts in stream) + 1
    results = run_kernel(stream, windows, functions, [final_wm])
    assert results, "no windows emitted"
    for w in results:
        for i, fn in enumerate(functions):
            expected = brute_force_value(stream, w.start, w.end, fn)
            got = w.agg_values()[i] if w.has_value else None
            assert got == expected, (
                f"seed={seed} disorder={disorder} window=({w.start},{w.end}) fn={type(fn).__name__}: "
                f"kernel={got} brute={expected}"
            )


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("disorder", [0.0, 0.2])
def test_session_vs_gaps_and_islands(seed, disorder):
    gap = 60
    stream = gen_stream(seed, 200, disorder, max_gap=50)
    windows = [SessionWindow(WindowMeasure.TIME, gap)]
    final_wm = max(ts for _, ts in stream) + gap + 1
    results = run_kernel(stream, windows, [SumAggregation()], [final_wm])

    # oracle: gaps-and-islands over the sorted full element set
    ordered = sorted(stream, key=lambda r: r[1])
    sessions = []
    cur_start, cur_end, cur_sum = ordered[0][1], ordered[0][1], ordered[0][0]
    for v, ts in ordered[1:]:
        if ts - cur_end > gap:
            sessions.append((cur_start, cur_end + gap, cur_sum))
            cur_start, cur_end, cur_sum = ts, ts, v
        else:
            cur_end, cur_sum = max(cur_end, ts), cur_sum + v
    sessions.append((cur_start, cur_end + gap, cur_sum))
    expected = [s for s in sessions if s[1] < final_wm]

    got = [(w.start, w.end, w.agg_values()[0]) for w in results]
    assert got == expected, f"seed={seed} disorder={disorder}\nkernel={got}\noracle={expected}"


@pytest.mark.parametrize("seed", range(5))
def test_count_tumbling_vs_bruteforce(seed):
    """Count windows are positional over arrival order re-sorted by ts."""
    size = 7
    stream = gen_stream(seed, 150, 0.1)
    windows = [TumblingWindow(WindowMeasure.COUNT, size)]
    final_wm = max(ts for _, ts in stream) + 1
    results = run_kernel(stream, windows, [SumAggregation()], [final_wm])

    ordered = sorted(stream, key=lambda r: r[1])
    for w in results:
        expected = sum(v for v, _ in ordered[w.start : w.end])
        assert w.end - w.start == size
        assert w.agg_values()[0] == expected, f"seed={seed} window=({w.start},{w.end})"


@pytest.mark.parametrize("seed", range(4))
def test_incremental_watermarks_match_single_watermark(seed):
    """Emitting with many intermediate watermarks must produce the same
    window set as one final watermark (fixed windows, bounded disorder)."""
    stream = gen_stream(seed, 250, 0.1)
    functions = [SumAggregation()]
    mk = lambda: [
        TumblingWindow(WindowMeasure.TIME, 100),
        SlidingWindow(WindowMeasure.TIME, 150, 75),
    ]
    final_wm = max(ts for _, ts in stream) + 1

    # a leading wm=0 pins lastWatermark to 0; otherwise the first-watermark
    # init (lastWatermark = wm - maxLateness, WindowManager.java:42-43)
    # would skip all windows older than maxLateness
    single = run_kernel(stream, mk(), functions, [0, final_wm])

    op = SlicingWindowOperator()
    op.add_aggregation(SumAggregation())
    for w in mk():
        op.add_window(w)
    many = []
    for v, ts in stream:
        op.process_element(v, ts)
    for wm in list(range(0, final_wm, 97)) + [final_wm]:
        many.extend(op.process_watermark(wm))

    # set-compare: a sliding window whose end lands exactly on wm+1 is
    # re-triggered by the next watermark (SlidingWindow.java:58-69 uses
    # `end <= wm + 1` to emit but `end > lastWm` to stop) — duplicate
    # emissions are reference behaviour, values are identical
    key = lambda ws: {(w.start, w.end, tuple(w.agg_values())) for w in ws if w.has_value}
    assert key(many) == key(single)
