"""Deterministic sampling / dataset-split operators for training-data
pipelines.

Both operators are content-addressed: membership is a pure function of a
row's id and a caller-chosen salt, via the portable md5-60 hash family
(``plans/portable_hash.py``) that DuckDB reproduces bit-for-bit. That
property is what a 100 TB corpus actually needs from its train/val split
and its rebalancing sample:

- **stable** — a document keeps its split/sample membership across
  pipeline re-runs, repartitions, cluster sizes, and incremental
  appends (no ``rand()``, no seed-per-partition coupling);
- **shuffle-free** — ``deterministic_split`` is a narrow projection
  (the filter/CASE pushes into the scan; splitting 100 TB costs one
  pass, not one shuffle); ``stratified_sample_cap`` adds only ONE
  aggregation over the strata columns (tiny output: one row per
  stratum) joined back as a broadcast — the data side never shuffles;
- **auditable** — the same arithmetic runs as plain SQL in any engine
  with md5, so split membership can be re-derived independently of
  Spark (the correctness gates hold Spark to exactly that SQL).

No reference equivalent (Scotty has no relational surface); this plane
belongs to the LLM-pipeline brief alongside dedup/similarity/text.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .portable_hash import md5_60

DENOM = 1_000_000
"""Bucket resolution: split fractions are expressed in millionths, so
the coarsest representable fraction is 1e-6 and threshold arithmetic is
exact integer math in both Spark and the SQL oracle."""


def split_bucket(id_col: Column, salt: str, denom: int = DENOM) -> Column:
    """Uniform bucket in [0, denom) from (salt, id) — the membership
    primitive both operators share. md5-60 is uniform over 60 bits, so
    pmod by 1e6 (≪ 2^60) is uniform to ~1e-12 bias."""
    return F.pmod(
        md5_60(F.concat(F.lit(salt), id_col.cast("string"))), F.lit(int(denom))
    )


def deterministic_split(
    df: DataFrame,
    id_col: str,
    splits: Dict[str, float],
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test…) by
    hashed id. ``splits`` maps name → fraction; fractions must sum to 1
    (±1e-9). Assignment is a CASE over cumulative integer thresholds —
    a narrow, zero-shuffle projection that Catalyst folds into the scan,
    and a row's split never changes when data is added or repartitioned.

    Changing ``salt`` produces an independent re-split (e.g. per
    training run); keeping it pins membership forever — the
    leakage-control property: a val document can never drift into train
    on a later pipeline run."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if not splits:
        raise ValueError("at least one split required")
    names = list(splits)
    # cumulative thresholds in exact integer millionths; the last split
    # absorbs rounding remainder so coverage is total by construction
    cum, bounds = 0.0, []
    for name in names[:-1]:
        cum += splits[name]
        bounds.append(int(round(cum * DENOM)))
    b = split_bucket(F.col(id_col), salt)
    # forward CASE: first threshold wins
    case = F.when(b < F.lit(bounds[0]), F.lit(names[0])) if bounds else None
    for name, bound in zip(names[1:-1], bounds[1:]):
        case = case.when(b < F.lit(bound), F.lit(name))
    expr = case.otherwise(F.lit(names[-1])) if case is not None else F.lit(names[-1])
    return df.withColumn(out_col, expr)


def split_thresholds_sql(
    id_expr: str, splits: Dict[str, float], salt: str = "split-v1"
) -> str:
    """The oracle-side CASE for ``deterministic_split`` — identical
    integer thresholds over the identical md5-60 bucket, as ANSI-ish SQL
    (DuckDB syntax for the hex parse). Kept next to the operator so the
    two can never drift independently."""
    from .portable_hash import md5_60_sql

    salted = f"'{salt}' || cast({id_expr} as varchar)"
    bucket = f"({md5_60_sql(salted)} % {DENOM})"
    names = list(splits)
    cum, arms = 0.0, []
    for name in names[:-1]:
        cum += splits[name]
        arms.append(f"WHEN {bucket} < {int(round(cum * DENOM))} THEN '{name}'")
    if not arms:
        return f"'{names[-1]}'"
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"


def stratified_sample_cap(
    df: DataFrame,
    strata: Sequence[str],
    id_col: str,
    cap: int,
    salt: str = "sample-v1",
) -> DataFrame:
    """Downsample each stratum (e.g. (lang, source)) to ≈``cap`` rows,
    deterministically: per-stratum keep-rate ``min(1, cap/size)`` is
    computed from ONE tiny aggregation (a row per stratum), broadcast
    back, and applied as a hash threshold — so the 100 TB data side is
    filtered in place with no shuffle, and membership is reproducible
    row-for-row. Strata at or under the cap pass through whole.

    The keep-rate uses exact integer division (``cap*DENOM div size``)
    so the SQL oracle computes the identical threshold; kept counts are
    Binomial(size, rate) around the cap (hash sampling trades exact-k
    for statelessness — exact-k would need a per-stratum sort/rank, a
    full shuffle of every oversized stratum)."""
    strata = list(strata)
    sizes = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("_stratum_size"))
    rates = sizes.withColumn(
        "_keep_num",
        F.least(
            F.lit(DENOM).cast("long"),
            F.expr(f"{int(cap) * DENOM} div _stratum_size"),
        ),
    )
    return (
        df.join(F.broadcast(rates), strata)
        .where(split_bucket(F.col(id_col), salt) < F.col("_keep_num"))
        .drop("_stratum_size", "_keep_num")
    )
