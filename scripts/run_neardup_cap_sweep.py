"""Sweep embedding_near_dup's bucket-density cap vs recall (round-5 task).

At sf1.0 the near-dup query's candidate mass grows quadratically with
bucket density (worst 10x wall ratio in the r4 scale validation). The
``max_bucket_size`` cap drops over-dense (tbl, bucket) groups from
candidate generation; this script measures, per cap value at a given SF:

- wall seconds (min of ``--repeats`` warm runs, shared-host discipline),
- emitted pair count,
- recall vs the UNCAPPED LSH output (the right denominator for choosing
  the cap: the cap should shed quadratic collision mass, not pairs),
- candidate-pair count (the quantity the cap actually bounds).

Usage: python scripts/run_neardup_cap_sweep.py \
    [--sf-dir /tmp/scotty_sfdata/sf1.0] [--repeats 2] [--caps 512,256,128,64]
Appends a table to stdout; curate the numbers into BENCH/neardup_cap.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/scotty_sfdata/sf1.0")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--caps", default="512,256,128,64,32")
    ap.add_argument("--threshold", type=float, default=0.2)
    args = ap.parse_args()

    from bench import CPUS, build_spark

    from scotty_window_processor_spark.plans.similarity import (
        embedding_near_dup,
        signed_projection_buckets,
    )

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    n_vecs = emb.count()

    # bucket-density profile (what the cap acts on)
    from pyspark.sql import functions as F

    bc = (
        signed_projection_buckets(emb, "vec_id", "embedding", 64, 10, 6)
        .groupBy("tbl", "bucket").count()
    )
    prof = bc.agg(
        F.count("*").alias("buckets"),
        F.max("count").alias("max"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.expr("percentile_approx(count, 0.5)").alias("p50"),
    ).collect()[0]
    print(f"vectors={n_vecs} buckets={prof['buckets']} "
          f"bucket_size p50={prof['p50']} p99={prof['p99']} max={prof['max']}",
          flush=True)

    def run(cap):
        best, pairs = None, None
        for _ in range(args.repeats):
            t0 = time.time()
            out = embedding_near_dup(
                emb, threshold=args.threshold, dim=64, max_bucket_size=cap
            )
            got = set((r["id_a"], r["id_b"]) for r in out.collect())
            w = time.time() - t0
            best = w if best is None else min(best, w)
            pairs = got
        return best, pairs

    # warm the worker pool / parquet footers before timing anything
    run(64)

    results = {}
    wall_unc, pairs_unc = run(None)
    results["uncapped"] = {"wall": round(wall_unc, 2), "pairs": len(pairs_unc),
                           "recall": 1.0}
    print(f"uncapped: wall={wall_unc:.2f}s pairs={len(pairs_unc)}", flush=True)

    for cap in [int(c) for c in args.caps.split(",")]:
        wall, pairs = run(cap)
        rec = len(pairs & pairs_unc) / max(1, len(pairs_unc))
        extra = len(pairs - pairs_unc)
        results[str(cap)] = {"wall": round(wall, 2), "pairs": len(pairs),
                             "recall": round(rec, 4)}
        print(f"cap={cap}: wall={wall:.2f}s pairs={len(pairs)} "
              f"recall_vs_uncapped={rec:.4f} extra={extra}", flush=True)

    print(json.dumps({"sf_dir": args.sf_dir, "n_vecs": n_vecs,
                      "threshold": args.threshold, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
