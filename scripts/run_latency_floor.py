"""Decompose the streaming emission-latency floor (round-5 task).

The probe's emission latency is NOT operator time: a window becomes
emittable when micro-batch N's post-commit watermark passes its end, and
it is emitted by batch N+1 — so the measured latency is one micro-batch
turnaround. This script runs the flagship streaming probe under several
configurations and prints, per configuration, the latency percentiles
plus the per-batch durationMs breakdown (addBatch = operator + state IO,
walCommit/commitOffsets = driver WAL fsyncs, the rest = scheduling), so
the floor can be attributed and the tunable parts tuned.

Usage: python scripts/run_latency_floor.py [--repeats 3]
Writes BENCH/latency_floor.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

CONFIGS = [
    # (label, kwargs)
    ("baseline hdfs, 8 state tasks", {"shuffle_partitions": "8"}),
    ("hdfs, 4 state tasks", {"shuffle_partitions": "4"}),
    ("hdfs, 2 state tasks", {"shuffle_partitions": "2"}),
    ("rocksdb, 8 state tasks", {"shuffle_partitions": "8", "state_store": ROCKSDB}),
    ("hdfs, 8 tasks, availableNow", {"shuffle_partitions": "8", "available_now": True}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from bench import CPUS, build_spark, streaming_probe

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the session (JVM/python-worker startup must not pollute run 1)
    streaming_probe(spark, queryname="floor_warm", collect_durations=False)

    results = []
    seq = 0
    for label, kw in CONFIGS:
        best = None
        for r in range(args.repeats):
            seq += 1
            res = streaming_probe(
                spark, queryname=f"floor_{seq}", collect_durations=True, **kw
            )
            # min-of-N on p99: the host is shared, minima are comparable
            if best is None or (res["emit_latency_p99_ms"] or 1 << 30) < (
                best["emit_latency_p99_ms"] or 1 << 30
            ):
                best = res
        results.append((label, best))
        print(label, json.dumps(best), flush=True)

    lines = [
        "# Streaming emission-latency floor decomposition",
        "",
        "Probe: flagship streaming job (tumbling 10m + session 5m over 32k",
        "synthesized turns, 13 micro-batches, memory sink), min-of-"
        f"{args.repeats} per configuration on a shared host.",
        "",
        "Latency definition: emit wall-clock minus the trigger start of the",
        "first micro-batch whose watermark passed the window end — i.e. ONE",
        "micro-batch turnaround, since a window emittable after batch N's",
        "commit is emitted by batch N+1's timers.",
        "",
        "| configuration | p50 ms | p99 ms | wall s | addBatch ms | walCommit ms | commitOffsets ms | trigger ms |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for label, res in results:
        d = res.get("duration_ms_mean", {})
        lines.append(
            f"| {label} | {res['emit_latency_p50_ms']} | {res['emit_latency_p99_ms']}"
            f" | {res['wall_sec']} | {d.get('addBatch', '-')} | {d.get('walCommit', '-')}"
            f" | {d.get('commitOffsets', '-')} | {d.get('triggerExecution', '-')} |"
        )
    out = "\n".join(lines) + "\n"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "latency_floor.md")
    with open(path, "w") as f:
        f.write(out)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
