"""spark-submit entrypoint (north_rule: runs via spark-submit --py-files).

    zip -r scotty.zip scotty_window_processor_spark
    spark-submit --py-files scotty.zip scripts/submit_job.py <mode> ...

(spark-submit has no module mode; scripts/submit_job.py is the submittable
script and this module is the implementation it calls.)

Modes:
  batch    — read a transcripts table, run a window set, write parquet
  stream   — readStream → stateful slicing operator → exactly-once sink
  synth    — synthesize a deterministic transcripts table to parquet

Window specs are CLI strings mirroring the reference's benchmark config
syntax (benchmark/.../BenchmarkRunner.java:93-172):
  tumbling:60000  sliding:60000:5000  session:30000  count_tumbling:25
(each optionally suffixed :id=N)
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def parse_window(spec: str):
    from .operators import SessionWindow, SlidingWindow, TumblingWindow, WindowMeasure

    parts = spec.split(":")
    kind = parts[0]
    window_id = -1
    args = []
    for p in parts[1:]:
        if p.startswith("id="):
            window_id = int(p[3:])
        else:
            args.append(int(p))
    if kind == "tumbling":
        return TumblingWindow(WindowMeasure.TIME, args[0], window_id)
    if kind == "sliding":
        return SlidingWindow(WindowMeasure.TIME, args[0], args[1], window_id)
    if kind == "session":
        return SessionWindow(WindowMeasure.TIME, args[0], window_id)
    if kind == "count_tumbling":
        return TumblingWindow(WindowMeasure.COUNT, args[0], window_id)
    if kind == "count_sliding":
        return SlidingWindow(WindowMeasure.COUNT, args[0], args[1], window_id)
    raise ValueError(f"unknown window spec: {spec}")


def default_aggs():
    from .functions import CountAggregation, SumAggregation

    return [("turns", "long", CountAggregation), ("tool_calls", "double", SumAggregation)]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["batch", "stream", "synth"])
    ap.add_argument("--input", help="transcripts parquet path (batch/stream)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", help="checkpoint dir (stream)")
    ap.add_argument("--window", action="append", default=None,
                    help="window spec, repeatable (default: tumbling:600000 + session:300000)")
    ap.add_argument("--key", default="conv_id")
    ap.add_argument("--ts", default="ts")
    ap.add_argument("--watermark-delay", default="30 seconds")
    ap.add_argument("--lateness-ms", type=int, default=30_000)
    ap.add_argument("--n-convs", type=int, default=1000)
    ap.add_argument("--turns-per-conv", type=int, default=100)
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName(f"scotty-{args.mode}").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    if args.mode == "synth":
        from .sources import synthesize_transcripts

        synthesize_transcripts(
            spark, n_convs=args.n_convs, turns_per_conv=args.turns_per_conv
        ).write.mode("overwrite").parquet(args.output)
        return 0

    windows = [parse_window(s) for s in (args.window or ["tumbling:600000:id=1", "session:300000:id=3"])]

    if args.mode == "batch":
        from .plans.scotty_batch import scotty_window_aggregate

        df = spark.read.parquet(args.input).withColumn(
            "is_tool_call", F.col("tool").isNotNull().cast("double")
        )
        out = scotty_window_aggregate(
            df, key=args.key, ts=args.ts, value="is_tool_call",
            windows=windows, aggs=default_aggs(), lateness_ms=args.lateness_ms,
        )
        out.write.mode("overwrite").parquet(args.output)
        return 0

    # stream
    from .sources import transcripts_schema
    from .streaming.processor import scotty_stream
    from .streaming.sink import write_stream_exactly_once

    stream = (
        spark.readStream.schema(transcripts_schema())
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.input)
        .withColumn("is_tool_call", F.col("tool").isNotNull().cast("double"))
    )
    result = scotty_stream(
        stream, key=args.key, ts=args.ts, value="is_tool_call",
        windows=windows, aggs=default_aggs(),
        watermark_delay=args.watermark_delay, lateness_ms=args.lateness_ms,
    )
    sink, writer = write_stream_exactly_once(result, args.output, args.checkpoint, trigger_once=True)
    q = writer.start()
    q.awaitTermination()
    print(f"lineage batches: {len(sink.lineage())}, rows: {sum(m['rows'] for m in sink.lineage())}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
