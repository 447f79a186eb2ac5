"""Batch (DataFrame/Catalyst) implementations of the engine's operators.

Everything here is declarative DataFrame/SQL first: Catalyst gets to push
filters into the parquet scan, prune columns, broadcast small join sides,
and keep the hot path inside whole-stage codegen. Python only appears in
the kernel-backed multi-window operator (``scotty_batch``) and the
multimodal stubs — always Arrow-batched per key group, never per row.
"""


def shuffle_partitions(spark) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating non-numeric
    values (e.g. ``"auto"`` under Databricks auto-optimized shuffle)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "64"))
    except ValueError:
        return spark.sparkContext.defaultParallelism or 64
