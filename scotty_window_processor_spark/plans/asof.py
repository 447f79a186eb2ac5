"""As-of (point-in-time) join — the classic training-pipeline primitive the
reference engine lacks entirely (Scotty has no join operator of any kind;
SURVEY.md §2.3 "Joins: absent").

For every left row, attach the MOST RECENT right row with the same key
whose timestamp is <= the left timestamp (backward as-of, inclusive) —
"what was the last known state of X when this event happened". Feature
stores, label joins, slowly-changing-dimension lookups.

Scale design — union + running window, NO join node:

    left ∪ right  →  one hash exchange on the key  →  one sort per
    partition (key, ts, side)  →  running last_value(right payload)

vs the two standard alternatives at 100 TB:
  * equi-join + filter + row_number: materialises |left| × |matching
    right| intermediate rows — quadratic on hot keys before the filter.
  * interval join: needs a bounded time range to prune; an UNBOUNDED
    backward as-of forces the full cross per key anyway.
The union form shuffles each input exactly once (bytes = |L| + |R|, no
candidate blow-up), the sort is the same sort a sort-merge join would
pay, and the running `last(..., ignorenulls=True)` is O(1) per row.
Hot keys: cost stays linear in the key's row count (a window scan, not a
pairwise product), so skew degrades to a straggler at worst — the same
salting/AQE toolbox as any keyed sort applies.

Determinism contract: `right` must be unique per (keys..., right_ts) —
pre-aggregate ties (e.g. max_by on a tiebreak id) before calling. The
right payload travels as ONE struct so a match is always a whole row,
never a column-wise mix of ties (per-column last(ignorenulls) would mix
rows when a right payload column is legitimately NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAY = "__asof_rpay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_ms: int | None = None,
    right_prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: `direction="backward"` (default) attaches the most
    recent right row with right.ts <= left.ts; `direction="forward"`
    attaches the EARLIEST right row with right.ts >= left.ts (label
    joins: "the next outcome after this event"). Both inclusive.

    Returns every `left` row (all its columns, original names) plus one
    `{right_prefix}{c}` column per entry of `right_cols` (default: every
    right column that is neither a key nor the right timestamp) and
    `{right_prefix}{right_ts}` — all NULL when no right row matches.

    `tolerance_ms`: if set, a match farther than this many milliseconds
    from the left timestamp is treated as no-match (nulls), like
    pandas.merge_asof(tolerance=...).

    Equal timestamps on both sides match (inclusive) — the side tag
    sorts the right row into the left row's window frame, mirroring
    DuckDB/standard ASOF `>=` / `<=`. The plan is identical either way:
    union + one exchange + one running window scan; forward just flips
    the frame (first() over following) and the tie order.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if right_cols is None:
        skip = set(on) | {right_ts}
        right_cols = [c for c in right.columns if c not in skip]

    backward = direction == "backward"
    # inclusive tie order: the right row must fall inside the left row's
    # frame at equal ts — before it for backward, after it for forward
    left_tag, right_tag = (1, 0) if backward else (0, 1)
    rpay = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(right_tag).alias(_SIDE),
        rpay.alias(_PAY),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields if f.name not in on],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(left_tag).alias(_SIDE),
        F.lit(None).cast(dict(r.dtypes)[_PAY]).alias(_PAY),
        *[c for c in left.columns if c not in on],
    )

    if backward:
        w = (
            Window.partitionBy(*on)
            .orderBy(_TS, _SIDE)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        running = F.last(_PAY, ignorenulls=True)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(_TS, _SIDE)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        running = F.first(_PAY, ignorenulls=True)
    matched = (
        l.unionByName(r)
        .withColumn(_PAY, running.over(w))
        .where(F.col(_SIDE) == left_tag)
    )
    if tolerance_ms is not None:
        # cast before unix_millis: inputs may be TIMESTAMP_NTZ (parquet
        # isAdjustedToUTC=false), which unix_millis rejects. Both sides
        # cast through the same session timezone, so the DIFFERENCE is
        # exact for any tz (both sides shift identically).
        gap = F.unix_millis(F.col(_TS).cast("timestamp")) - F.unix_millis(
            F.col(_PAY)[right_ts].cast("timestamp")
        )
        in_tol = F.abs(gap) <= F.lit(tolerance_ms)
        matched = matched.withColumn(_PAY, F.when(in_tol, F.col(_PAY)))

    out = [F.col(c) for c in left.columns]
    out.append(F.col(_PAY)[right_ts].alias(f"{right_prefix}{right_ts}"))
    out.extend(F.col(_PAY)[c].alias(f"{right_prefix}{c}") for c in right_cols)
    return matched.select(*out)
