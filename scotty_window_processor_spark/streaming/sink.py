"""Exactly-once parquet sink with per-partition lineage + metrics.

Spark's streaming file sink is already exactly-once via the write-ahead
manifest; this sink adds what the north_rule asks beyond that — lineage
records per micro-batch partition and idempotent re-delivery on restart:

- each micro-batch writes to ``<out>/batch_id=<N>/`` with dynamic
  partition overwrite: a batch replayed after a crash (same batch_id from
  the checkpointed offset log) OVERWRITES its own output instead of
  appending a duplicate — the standard foreachBatch idempotence recipe;
- a ``_lineage/batch-<N>.json`` manifest records row counts and window
  ranges per partition, committed AFTER the data write (readers treat
  data without a manifest as in-flight);
- downstream consumers read ``read_committed`` to see only manifested
  batches.

The reference has no sink at all (demo `print()`, benchmark no-op —
SURVEY.md §2.3); exactly-once semantics here come from Spark's
checkpointed offset tracking + idempotent writes.

Iceberg: the north_rule words the sink as an Iceberg table. This container
ships NO Iceberg runtime (no iceberg-spark-runtime jar anywhere on the
image, and installs are not permitted), so parquet + the lineage manifest
is the documented stand-in — the ``table_format`` knob switches the write
to ``format("iceberg")`` on a cluster that has the runtime, where the
batch_id-keyed overwrite maps to Iceberg's replacePartitions commit. The
waiver is recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(
        self,
        out_dir: str,
        partition_cols: list[str] | None = None,
        table_format: str = "parquet",
        max_manifest_files: int = 4096,
    ):
        self.out_dir = out_dir
        self.partition_cols = partition_cols or []
        self.table_format = table_format
        # per-file lineage detail cap (guide §5: the driver should not
        # assemble unbounded collections): a pathological small-files
        # batch would otherwise collect one row per data file into the
        # driver manifest. Batch TOTALS are always computed server-side
        # in one aggregate; the per-file list is truncated at this cap
        # with an explicit files_total/files_listed marker. The
        # exactly-once replay contract only uses path + rows, so a
        # truncated manifest commits identically.
        self.max_manifest_files = max_manifest_files
        self.lineage_dir = os.path.join(out_dir, "_lineage")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(self.lineage_dir, exist_ok=True)
        manifest_path = os.path.join(self.lineage_dir, f"batch-{batch_id}.json")

        path = os.path.join(self.out_dir, f"batch_id={batch_id}")
        # overwrite THIS batch's directory only: replays are idempotent
        writer = batch_df.write.mode("overwrite").format(self.table_format)
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.save(path)

        spark = batch_df.sparkSession
        # read back with the SAME format: an Iceberg path keeps superseded
        # data files from earlier snapshots, so a raw parquet read would
        # double-count exactly in the crash-replay case this sink exists for
        written = spark.read.format(self.table_format).load(path)
        # lineage at PARTITION granularity (north_rule): one row per
        # committed data file (= one write task partition), aggregated in a
        # single pass — the batch totals are the partition sums
        per_file = written.groupBy(F.input_file_name().alias("file")).agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("w_start").alias("min_w_start"),
            F.max("w_end").alias("max_w_end"),
        )
        # batch totals roll up SERVER-side (one tiny row to the driver);
        # the per-file detail is capped (see __init__)
        tot = per_file.agg(
            F.count(F.lit(1)).alias("files"),
            F.sum("rows").alias("rows"),
            F.min("min_w_start").alias("min_w_start"),
            F.max("max_w_end").alias("max_w_end"),
        ).collect()[0]
        cap = self.max_manifest_files
        parts = per_file.orderBy("file").limit(cap).collect()
        manifest = {
            "batch_id": batch_id,
            "rows": tot["rows"] or 0,
            "min_w_start": tot["min_w_start"],
            "max_w_end": tot["max_w_end"],
            "files_total": tot["files"],
            "files_listed": len(parts),
            "partitions": [
                {
                    # strip the batch directory prefix: file ids stay valid
                    # if the table is relocated
                    "file": p["file"].split(f"batch_id={batch_id}/", 1)[-1],
                    "rows": p["rows"],
                    "min_w_start": p["min_w_start"],
                    "max_w_end": p["max_w_end"],
                }
                for p in parts
            ],
            "committed_at_ms": int(time.time() * 1000),
            "path": path,
        }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)  # atomic commit marker

    def read_committed(self, spark: SparkSession) -> DataFrame:
        """Read only batches whose lineage manifest was committed."""
        batches = self.lineage()
        paths = [b["path"] for b in batches if b["rows"] > 0 and os.path.isdir(b["path"])]
        if not paths:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType([]))
        if self.table_format == "parquet":
            return spark.read.parquet(*paths)
        out = spark.read.format(self.table_format).load(paths[0])
        for p in paths[1:]:
            out = out.unionAll(spark.read.format(self.table_format).load(p))
        return out

    def lineage(self) -> list[dict]:
        out = []
        if os.path.isdir(self.lineage_dir):
            for name in sorted(os.listdir(self.lineage_dir)):
                if name.startswith("batch-") and name.endswith(".json"):
                    with open(os.path.join(self.lineage_dir, name)) as f:
                        out.append(json.load(f))
        return out


def write_stream_exactly_once(
    result: DataFrame, out_dir: str, checkpoint_dir: str, trigger_once: bool = False
):
    """Attach the exactly-once sink to a streaming result DataFrame."""
    sink = ExactlyOnceParquetSink(out_dir)
    writer = (
        result.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return sink, writer
