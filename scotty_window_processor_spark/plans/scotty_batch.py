"""Kernel-backed multi-window shared aggregation over a batch DataFrame.

This is the batch entry point into the slicing engine: one shuffle by key
(`groupBy(key).applyInPandas`), then each key group flows through the
general stream-slicing kernel as one Arrow batch. All concurrent window
definitions — any mix of tumbling / sliding / session, time- or
count-measured — share a single slice store per key, the reference's
headline aggregate-sharing property (LazyAggregateStore.aggregate,
/root/reference/slicing/.../LazyAggregateStore.java:81-99), which Spark's
built-in `F.window` cannot express (it duplicates rows per overlapping
window instead).

Scale notes:
- the only shuffle is the groupBy(key); slice partials keep per-key state
  O(slices × functions), not O(rows);
- a vectorized numpy fast path (fixed time windows, in-order batches)
  bypasses the per-element loop — see `_vectorized_fixed_time`;
- hot-key skew is handled upstream by `plans.skew.salted_scotty` (salting
  is legal for associative/commutative functions; sessions route unsalted).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import (
    AggregateFunction,
    CountAggregation,
    MaxAggregation,
    MeanAggregation,
    MinAggregation,
    SumAggregation,
)
from ..operators.kernel import SlicingWindowOperator
from ..operators.windows import SessionWindow, SlidingWindow, TumblingWindow, Window, WindowMeasure

# (output column name, spark type DDL, aggregate-function factory)
AggSpec = Tuple[str, str, Callable[[], AggregateFunction]]

_NUMPY_FAST = {
    SumAggregation: ("sum", None),
    CountAggregation: ("count", None),
    MinAggregation: ("min", None),
    MaxAggregation: ("max", None),
}


def _final_watermark(max_ts: int, windows: Sequence[Window], lateness: int) -> int:
    horizon = lateness + 1
    for w in windows:
        if isinstance(w, SessionWindow):
            horizon = max(horizon, w.gap + 1)
        elif w.measure == WindowMeasure.TIME:
            horizon = max(horizon, w.clear_delay() + 1)
    return max_ts + horizon


def scotty_window_aggregate(
    df: DataFrame,
    key: str,
    ts: str,
    value: Optional[str],
    windows: Sequence[Window],
    aggs: Sequence[AggSpec],
    lateness_ms: int = 1000,
    arrival_order: Optional[str] = None,
    prefer_catalyst: bool = True,
) -> DataFrame:
    """Batch windowed aggregation with a three-tier physical planner:

    1. **Catalyst built-ins** (prefer_catalyst, standard aggregates, time
       windows): tumbling/sliding → F.window, session → F.session_window.
       Pure JVM, whole-stage codegen, partial aggregation before the
       shuffle — the fastest plan Spark can produce, used whenever the
       built-ins can express the semantics.
    2. **numpy fast path**: one Arrow batch per key, segment reductions
       (count-measure windows, and time windows when tier 1 is off).
    3. **pure-Python kernel**: exact Scotty slice semantics for anything
       else (custom lift/combine/lower functions, out-of-order replays).

    All tiers emit the same schema and provably identical rows (see
    tests/test_scotty_batch_spark.py); the tier split is per window
    family, results are unioned.

    Output: (key, window_id, measure, w_start, w_end, <one column per agg>).
    Time windows report epoch-ms bounds; count windows report ordinal bounds.
    """
    catalyst_exprs = _catalyst_aggs(aggs, value) if value is not None else None
    if prefer_catalyst and catalyst_exprs is not None:
        time_windows = [w for w in windows if w.measure == WindowMeasure.TIME
                        and isinstance(w, (TumblingWindow, SlidingWindow, SessionWindow))]
        rest = [w for w in windows if w not in time_windows]
        agg_names = [name for name, _, _ in aggs]
        parts = [
            _catalyst_window_plan(df, key, ts, w, _catalyst_aggs(aggs, value), agg_names)
            for w in time_windows
        ]
        if rest:
            parts.append(
                scotty_window_aggregate(
                    df, key, ts, value, rest, aggs, lateness_ms, arrival_order,
                    prefer_catalyst=False,
                )
            )
        if parts:
            out = parts[0]
            for p in parts[1:]:
                out = out.unionAll(p)
            return out

    key_field = df.schema[key]
    out_schema = T.StructType(
        [
            T.StructField(key, key_field.dataType, True),
            T.StructField("window_id", T.LongType(), False),
            T.StructField("measure", T.StringType(), False),
            T.StructField("w_start", T.LongType(), False),
            T.StructField("w_end", T.LongType(), False),
        ]
        + [T.StructField(name, T._parse_datatype_string(ddl), True) for name, ddl, _ in aggs]
    )

    window_defs = list(windows)
    agg_specs = list(aggs)
    sort_cols = [ts] + ([arrival_order] if arrival_order else [])
    use_fast = _fast_path_eligible(window_defs, agg_specs) and value is not None

    if use_fast:
        # tier 2: bucketed multi-key vectorization — thousands of keys per
        # Arrow batch, zero per-key Python (see plans.vectorized_multi)
        from .vectorized_multi import multikey_window_aggregate

        return multikey_window_aggregate(
            df, key, ts, value, window_defs, agg_specs, arrival_order
        )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({f.name: pd.Series(dtype="object") for f in out_schema.fields})
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        ts_ms = (pdf[ts].to_numpy().astype("datetime64[ms]").astype("int64"))
        key_val = pdf[key].iloc[0]
        final_wm = _final_watermark(int(ts_ms[-1]), window_defs, lateness_ms)

        if use_fast:
            rows = _vectorized_run(ts_ms, pdf[value].to_numpy(), window_defs, agg_specs, final_wm)
        else:
            rows = _kernel_run(pdf, ts_ms, value, window_defs, agg_specs, lateness_ms, final_wm)

        out = pd.DataFrame(rows, columns=[f.name for f in out_schema.fields[1:]])
        out.insert(0, key, key_val)
        return out

    if value is not None:
        # column-prune before the shuffle: payload columns never cross Arrow
        df = df.select(*dict.fromkeys([key, ts, value] + ([arrival_order] if arrival_order else [])))
    return df.groupBy(key).applyInPandas(run, out_schema)


def _catalyst_aggs(aggs: Sequence[AggSpec], value: str):
    """Map standard aggregate functions to Catalyst expressions, or None
    if any function has no built-in equivalent."""
    out = []
    for name, ddl, factory in aggs:
        fn = factory()
        if isinstance(fn, CountAggregation):
            expr = F.count(F.lit(1))
        elif isinstance(fn, SumAggregation):
            expr = F.sum(value)
        elif isinstance(fn, MinAggregation):
            expr = F.min(value)
        elif isinstance(fn, MaxAggregation):
            expr = F.max(value)
        elif isinstance(fn, MeanAggregation):
            expr = F.avg(value)
        else:
            return None
        out.append(expr.cast(ddl).alias(name))
    return out


def _catalyst_window_plan(
    df: DataFrame, key: str, ts: str, w: Window, agg_exprs, agg_names
) -> DataFrame:
    """One built-in window family as a pure Catalyst plan."""
    if isinstance(w, SessionWindow):
        win = F.session_window(F.col(ts), f"{w.gap} milliseconds")
    elif isinstance(w, SlidingWindow):
        win = F.window(F.col(ts), f"{w.size} milliseconds", f"{w.slide} milliseconds")
    else:
        win = F.window(F.col(ts), f"{w.size} milliseconds")
    return (
        df.groupBy(F.col(key), win.alias("w"))
        .agg(*agg_exprs)
        .select(
            F.col(key),
            F.lit(w.window_id).cast("long").alias("window_id"),
            F.lit("time").alias("measure"),
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("w_start"),
            F.unix_millis(F.col("w.end").cast("timestamp")).alias("w_end"),
            *[F.col(n) for n in agg_names],
        )
    )


def _fast_path_eligible(windows: Sequence[Window], aggs: Sequence[AggSpec]) -> bool:
    """Vectorizable iff every window type has a closed-form in-order batch
    semantics and every aggregate is a numpy segment reduction.

    In one-shot batch mode (sorted input + single flushing watermark) the
    window definitions decouple: fixed time windows are interval sums over
    the shared edge grid, sessions are gaps-and-islands, count windows are
    positional — slice *sharing* only matters for incremental streaming
    state, so each family reduces independently over one sorted array."""
    for w in windows:
        if isinstance(w, SessionWindow):
            if w.measure != WindowMeasure.TIME:
                return False
        elif isinstance(w, TumblingWindow):
            continue  # time or count both vectorizable
        elif isinstance(w, SlidingWindow):
            # slice-aligned window ends are needed for interval arithmetic
            # to equal the kernel's slice containment (size tiles the slide)
            if w.measure != WindowMeasure.TIME or w.size % w.slide != 0:
                return False
        else:
            return False
    return all(
        type(spec[2]()) in _NUMPY_FAST or isinstance(spec[2](), MeanAggregation) for spec in aggs
    )


def _vectorized_run(ts_ms, values, windows, aggs, final_wm):
    fixed = [
        w
        for w in windows
        if isinstance(w, (TumblingWindow, SlidingWindow)) and w.measure == WindowMeasure.TIME
    ]
    sessions = [w for w in windows if isinstance(w, SessionWindow)]
    counts = [w for w in windows if isinstance(w, TumblingWindow) and w.measure == WindowMeasure.COUNT]

    order = np.argsort(ts_ms, kind="stable")
    ts_sorted = ts_ms[order]
    vals = values[order].astype("float64")

    rows = []
    if fixed:
        rows.extend(_vectorized_fixed_time(ts_sorted, vals, fixed, aggs, final_wm))
    for w in sessions:
        rows.extend(_vectorized_session(ts_sorted, vals, w, aggs, final_wm))
    for w in counts:
        rows.extend(_vectorized_count_tumbling(ts_sorted, vals, w, aggs))
    return rows


def _segment_values(vals, seg_starts, seg_ends, aggs):
    """Per-segment aggregate vectors (segments non-empty, possibly
    non-contiguous after emission filtering — so min/max slice directly)."""
    csum = np.concatenate([[0.0], np.cumsum(vals)])
    sums = csum[seg_ends] - csum[seg_starts]
    cnts = (seg_ends - seg_starts).astype("int64")
    fns = [factory() for _, _, factory in aggs]
    out = []
    for i in range(len(seg_starts)):
        vals_i = []
        for fn in fns:
            if isinstance(fn, SumAggregation):
                vals_i.append(float(sums[i]))
            elif isinstance(fn, CountAggregation):
                vals_i.append(int(cnts[i]))
            elif isinstance(fn, MeanAggregation):
                vals_i.append(float(sums[i] / cnts[i]) if cnts[i] else None)
            elif isinstance(fn, MinAggregation):
                vals_i.append(float(np.min(vals[seg_starts[i] : seg_ends[i]])))
            elif isinstance(fn, MaxAggregation):
                vals_i.append(float(np.max(vals[seg_starts[i] : seg_ends[i]])))
        out.append(vals_i)
    return out


def _vectorized_session(ts_sorted, vals, w, aggs, final_wm):
    """Gaps-and-islands: session boundaries where the ts gap exceeds `gap`.
    Equals the kernel's SessionContext semantics for an in-order batch with
    one flushing watermark (session end = last ts + gap)."""
    gap = w.gap
    brk = np.nonzero(np.diff(ts_sorted) > gap)[0]
    seg_starts = np.concatenate([[0], brk + 1])
    seg_ends = np.concatenate([brk + 1, [len(ts_sorted)]])
    w_start = ts_sorted[seg_starts]
    w_end = ts_sorted[seg_ends - 1] + gap
    emit = w_end < final_wm
    agg_rows = _segment_values(vals, seg_starts[emit], seg_ends[emit], aggs)
    return [
        [w.window_id, "time", int(s), int(e), *a]
        for s, e, a in zip(w_start[emit], w_end[emit], agg_rows)
    ]


def _vectorized_count_tumbling(ts_sorted, vals, w, aggs):
    """Positional count windows over event-time order. Matches the kernel's
    flush semantics: windows with end <= total+1 are emitted, so the last
    window may be partial exactly when total ≡ -1 (mod n)."""
    n = w.size
    total = len(ts_sorted)
    n_windows = (total + 1) // n
    if n_windows == 0:
        return []
    seg_starts = np.arange(n_windows) * n
    seg_ends = np.minimum(seg_starts + n, total)
    agg_rows = _segment_values(vals, seg_starts, seg_ends, aggs)
    return [
        [w.window_id, "count", int(k * n), int((k + 1) * n), *a]
        for k, a in zip(range(n_windows), agg_rows)
    ]


def _kernel_run(pdf, ts_ms, value, windows, aggs, lateness_ms, final_wm):
    op = SlicingWindowOperator(max_lateness=lateness_ms)
    fns = [factory() for _, _, factory in aggs]
    for fn in fns:
        op.add_aggregation(fn)
    for w in windows:
        op.add_window(w)

    if value is not None:
        elements = pdf[value].to_numpy()
    else:
        cols = [c for c in pdf.columns]
        elements = pdf[cols].to_dict("records")

    op.seed_watermark(int(ts_ms[0]) - 1)
    for element, t in zip(elements, ts_ms.tolist()):
        op.process_element(element, t)
    results = op.process_watermark(final_wm)

    rows = []
    for w in results:
        if not w.has_value:
            continue
        vals = []
        for i in range(len(fns)):
            vals.append(fns[i].lower(w.agg_state.partials[i]) if w.agg_state.present[i] else None)
        rows.append([w.window_id, w.measure.value, w.start, w.end, *vals])
    return rows


def _vectorized_fixed_time(ts_ms, values, windows, aggs, final_wm):
    """In-order numpy fast path for fixed (tumbling/sliding) time windows.

    Slice edges are the union of every window's edge grid — computable by
    expression (StreamSlicer's in-order path, StreamSlicer.java:50-86,
    collapses to this) — so per-slice partials come from one
    np.add.reduceat-style pass and each window combines a contiguous slice
    range. Invertible functions (sum/count) use prefix sums: O(1) per
    window instance regardless of size/slide ratio."""
    ts_sorted = ts_ms  # pre-sorted by _vectorized_run
    vals = values
    lo, hi = int(ts_sorted[0]), int(ts_sorted[-1])

    steps = sorted({(w.slide if isinstance(w, SlidingWindow) else w.size) for w in windows})
    edges = np.unique(np.concatenate([np.arange((lo // s) * s, hi + s, s) for s in steps]))
    # slice i covers [edges[i], edges[i+1])
    slice_idx = np.searchsorted(edges, ts_sorted, side="right") - 1
    starts = np.searchsorted(slice_idx, np.arange(len(edges)), side="left")
    counts = np.diff(np.append(starts, len(ts_sorted)))

    # segment sums via prefix sums (reduceat mishandles empty segments:
    # a clipped trailing empty start index steals the previous segment's
    # last element)
    seg = np.append(starts, len(ts_sorted))
    csum = np.concatenate([[0.0], np.cumsum(vals)])
    sums = csum[seg[1:]] - csum[seg[:-1]]
    cnts = counts.astype("int64")
    psum = np.concatenate([[0.0], np.cumsum(sums)])
    pcnt = np.concatenate([[0], np.cumsum(cnts)])

    need_minmax = any(spec[2]().__class__ in (MinAggregation, MaxAggregation) for spec in aggs)
    if need_minmax:
        mins = np.full(len(edges), np.inf)
        maxs = np.full(len(edges), -np.inf)
        nz = counts > 0
        if nz.any():
            # consecutive non-empty segment starts are exact reduceat
            # boundaries (empty segments contribute no indices)
            nz_starts = seg[:-1][nz]
            mins[nz] = np.minimum.reduceat(vals, nz_starts)
            maxs[nz] = np.maximum.reduceat(vals, nz_starts)

    rows = []
    for w in windows:
        size = w.size
        step = w.slide if isinstance(w, SlidingWindow) else w.size
        first_start = (lo // step) * step
        # drop windows not fully covered by slices we materialised
        w_starts = np.arange(max(first_start - size + step, 0 if lo >= 0 else first_start), hi + step, step)
        w_starts = w_starts[(w_starts + size) <= final_wm]
        if len(w_starts) == 0:
            continue
        si = np.searchsorted(edges, w_starts, side="left")
        ei = np.searchsorted(edges, w_starts + size, side="left")
        si = np.clip(si, 0, len(edges))
        ei = np.clip(ei, 0, len(edges))
        wsum = psum[ei] - psum[si]
        wcnt = pcnt[ei] - pcnt[si]
        keep = wcnt > 0
        for pos in np.nonzero(keep)[0]:
            s0, e0 = int(si[pos]), int(ei[pos])
            out_vals = []
            for name, _, factory in aggs:
                fn = factory()
                if isinstance(fn, SumAggregation):
                    out_vals.append(float(wsum[pos]))
                elif isinstance(fn, CountAggregation):
                    out_vals.append(int(wcnt[pos]))
                elif isinstance(fn, MeanAggregation):
                    out_vals.append(float(wsum[pos] / wcnt[pos]))
                elif isinstance(fn, MinAggregation):
                    out_vals.append(float(mins[s0:e0].min()))
                elif isinstance(fn, MaxAggregation):
                    out_vals.append(float(maxs[s0:e0].max()))
            rows.append([w.window_id, "time", int(w_starts[pos]), int(w_starts[pos] + size), *out_vals])
    return rows
