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


_BUCKET_CAP = 32768  # stage task-count ceiling; override via buckets=


def adaptive_buckets(df) -> int:
    """Bucket count for the Python-tier shuffle, sized so each task carries
    roughly one TARGET UNIT of rows — max(spark.sql.execution.arrow
    .maxRecordsPerBatch, 65536) — instead of inheriting
    spark.sql.shuffle.partitions. Under a small maxRecordsPerBatch config
    a task therefore carries SEVERAL Arrow batches (the 65536-row floor
    is the real task-size target, keeping tiny-batch configs from
    exploding the task count); at the bench's 262144-row batches it is
    one batch per task.

    Why: the Python tiers are CPU/Arrow-bound, not shuffle-byte-bound —
    the right task size is ~one Arrow batch, far SMALLER than AQE's
    64 MB byte advisory. Measured on the 64M-turn flagship at local[16]:
    32 buckets (the old cpus×2 formula) = 49.7 s; 256 buckets (= rows /
    maxRecordsPerBatch) = 20.6 s — 2.4×. At local[4] the same change is
    103→54 s, so the win is task sizing, not parallelism.

    The row count comes from driver-side plan statistics (no job):
    optimizedPlan sizeInBytes over a calibrated ~4 compressed bytes per
    column per row (string-keyed parquet transcripts measure 13.8 B/row
    across 3 columns). Precision is not needed — the wall-time curve is
    flat within 2× of the optimum — so the estimate only has to land the
    right order of magnitude. Clamped to [max(shuffle.partitions,
    defaultParallelism), 32768]; at 100 TB the cap keeps the stage under
    ~32k tasks (pass ``buckets=`` explicitly to override either way).
    """
    spark = df.sparkSession
    lo = max(shuffle_partitions(spark), spark.sparkContext.defaultParallelism or 1)
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return lo
    if size <= 0 or size > 1 << 55:  # unstatted plans report a huge sentinel
        return lo
    rows_est = size // (4 * max(len(df.columns), 4))
    try:
        batch = int(spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000"))
    except ValueError:
        batch = 10000
    target = max(batch, 65536)  # tiny-batch configs should not explode task count
    want = -(-rows_est // target)
    return int(min(max(lo, want), _BUCKET_CAP))
