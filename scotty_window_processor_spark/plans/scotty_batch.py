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
) -> DataFrame:
    """Run the slicing kernel per key over a batch table.

    Rows feed the kernel in event-time order (ties broken by
    ``arrival_order`` when given), with one final flushing watermark, so
    every complete window is emitted — semantics equal to an ANSI-SQL
    recompute per window, which is exactly what the DuckDB oracles check.

    Output: (key, window_id, measure, w_start, w_end, <one column per agg>).
    Time windows report epoch-ms bounds; count windows report ordinal bounds.
    """
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

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({f.name: pd.Series(dtype="object") for f in out_schema.fields})
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        ts_ms = (pdf[ts].to_numpy().astype("datetime64[ms]").astype("int64"))
        key_val = pdf[key].iloc[0]
        final_wm = _final_watermark(int(ts_ms[-1]), window_defs, lateness_ms)

        if use_fast:
            rows = _vectorized_fixed_time(ts_ms, pdf[value].to_numpy(), window_defs, agg_specs, final_wm)
        else:
            rows = _kernel_run(pdf, ts_ms, value, window_defs, agg_specs, lateness_ms, final_wm)

        out = pd.DataFrame(rows, columns=[f.name for f in out_schema.fields[1:]])
        out.insert(0, key, key_val)
        return out

    return df.groupBy(key).applyInPandas(run, out_schema)


def _fast_path_eligible(windows: Sequence[Window], aggs: Sequence[AggSpec]) -> bool:
    for w in windows:
        if not isinstance(w, (TumblingWindow, SlidingWindow)) or w.measure != WindowMeasure.TIME:
            return False
        # slice-aligned window ends are needed for interval arithmetic to
        # equal the kernel's slice containment (size must tile the slide)
        if isinstance(w, SlidingWindow) and w.size % w.slide != 0:
            return False
    return all(
        type(spec[2]()) in _NUMPY_FAST or isinstance(spec[2](), MeanAggregation) for spec in aggs
    )


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
    order = np.argsort(ts_ms, kind="stable")
    ts_sorted = ts_ms[order]
    vals = values[order].astype("float64")
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
