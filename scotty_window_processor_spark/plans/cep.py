"""CEP: contiguous sequence-pattern detection over per-key ordered events.

The north-star engine description is "structured-streaming / CEP"; the
reference itself has no pattern operator (its CEP story is the windowing
kernel), so this plane is Spark-native by construction. Semantics are the
MATCH_RECOGNIZE core:

    PATTERN (S0 S1 ... S{L-1})           -- L strictly consecutive rows
    AFTER MATCH SKIP TO NEXT ROW         -- overlapping matches allowed

per key, ordered by ``(ts, tiebreak)``; a row sequence matches when row
``i`` of the run satisfies ``steps[i]`` and (optionally) the whole run
spans at most ``within_ms``.

100 TB plan shape: ONE exchange (hash partition by key) + one sort feed
the whole lead() family — every per-step column rides the same window
frame, the predicate conjunction is whole-stage codegen, and the
projection is pruned to ``step_cols ∪ capture ∪ {ts, tiebreak}`` before
the shuffle, so payload columns never cross it. No joins, no state.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .windowed import _epoch_ms

# a step predicate sees "its" row through a {column name -> Column} view
StepPredicate = Callable[[Mapping[str, Column]], Column]


def match_pattern(
    df: DataFrame,
    key: str,
    ts: str,
    steps: Sequence[StepPredicate],
    step_cols: Sequence[str],
    within_ms: Optional[int] = None,
    tiebreak: Optional[str] = None,
    capture: Sequence[str] = (),
) -> DataFrame:
    """Detect every contiguous run of ``len(steps)`` rows matching the
    step predicates, per ``key``, ordered by ``(ts, tiebreak)``.

    ``steps[i]`` is a callable receiving a dict of that step's columns
    (``step_cols`` plus ``ts``) and returning a boolean Column, e.g.
    ``lambda c: c["event_type"] == "view"``. Rows whose lookahead runs
    past the key's last row never match (lead() yields null → predicate
    null → filtered).

    Returns one row per match: ``key``, ``w_start``/``w_end`` (epoch-ms
    of the first/last matched row) and ``s{i}_{col}`` for every capture
    column at every step.
    """
    if not steps:
        raise ValueError("match_pattern needs at least one step")
    L = len(steps)
    needed = list(dict.fromkeys(list(step_cols) + list(capture) + [ts]))
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)

    proj_cols = list(dict.fromkeys(needed + ([tiebreak] if tiebreak else [])))
    sel = df.select(key, *proj_cols)
    step_view: list[Dict[str, Column]] = [{c: F.col(c) for c in needed}]
    lead_cols = []
    for j in range(1, L):
        view = {}
        for c in needed:
            name = f"_s{j}_{c}"
            lead_cols.append(F.lead(c, j).over(w).alias(name))
            view[c] = F.col(name)
        step_view.append(view)
    if lead_cols:
        sel = sel.select("*", *lead_cols)

    pred = steps[0](step_view[0])
    for j in range(1, L):
        pred = pred & steps[j](step_view[j])
    first_ms = _epoch_ms(F.col(ts))
    last_ms = _epoch_ms(step_view[L - 1][ts]) if L > 1 else first_ms
    if within_ms is not None:
        pred = pred & (last_ms - first_ms <= F.lit(within_ms))

    out_cols = [
        F.col(key),
        first_ms.alias("w_start"),
        last_ms.alias("w_end"),
    ]
    for j in range(L):
        for c in capture:
            out_cols.append(step_view[j][c].alias(f"s{j}_{c}"))
    return sel.where(pred).select(*out_cols)
