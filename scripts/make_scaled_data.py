"""Deterministically scale the driver-generated testdata by an integer
factor K (sf0.1 -> sf1.0 with K=10) for SCALE-VALIDATION benchmarking.

The brief forbids external data, so larger scales are synthesized from the
sf0.1 tables themselves: K copies with copy-shifted keys. The shifts are
chosen so per-query WORK SHAPES scale linearly instead of degenerating:

- events: user_id/event_id shifted per copy (K x keys, same per-key window
  density — how event data actually grows), ts unchanged.
- documents: doc_id shifted; copy i>0 RENAMES every word by appending
  'q<i>' — a 1:1 map of the word space, so intra-copy shingle sets,
  Jaccard values, and simhash vote structure are preserved exactly while
  cross-copy word/shingle overlap is zero. (Naive replication would give
  every doc K-1 exact twins and quadratic dedup candidates; injecting a
  shared marker TOKEN is equally wrong — one token voting once per word
  gap collapses every simhash in the copy to the marker's bit pattern,
  which blew dedup_simhash up to 112 M "near-dup" pairs when tried.)
- embeddings: vec_id shifted; copy i's vectors are np.roll'ed by 6*i
  coordinates — a permutation, so intra-copy pairwise cosines are EXACTLY
  preserved while cross-copy cosines are generically low (no artificial
  near-dup/tie mass). Copy 0 is untouched: the ANN gates' query side
  (vec_id < 5) and IVF centroid seed (vec_id < 16) keep their meaning.
- lineitem/orders/customer: order/cust keys shifted per copy; nationkey
  untouched so the dimension joins keep their selectivity.
- region/nation/supplier/part: copied verbatim (dimensions don't scale).

Usage:
    python scripts/make_scaled_data.py [--src /root/testdata/sf0.1] \
        [--dst /tmp/scotty_sfdata/sf1.0] [--factor 10] [--cpus 16]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/scotty_sfdata/sf1.0")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    args = ap.parse_args()
    K = args.factor

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("scotty-make-scaled-data")
        .config("spark.sql.shuffle.partitions", str(int(args.cpus) * 2))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(args.dst):
        shutil.rmtree(args.dst)
    os.makedirs(args.dst)

    def copies(df):
        return df.withColumn(
            "_c", F.explode(F.array(*[F.lit(i) for i in range(K)]))
        )

    def shift(col, span):
        return (F.col(col) + F.col("_c") * F.lit(span)).alias(col)

    def write(df, name, parts):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{args.dst}/{name}.parquet"
        )
        n = spark.read.parquet(f"{args.dst}/{name}.parquet").count()
        print(f"{name}: {n:,} rows", flush=True)

    src = lambda t: spark.read.parquet(f"{args.src}/{t}.parquet")

    ev = src("events")
    spans = ev.agg(
        (F.max("user_id") + 1).alias("u"), (F.max("event_id") + 1).alias("e")
    ).collect()[0]
    write(
        copies(ev).select(
            shift("event_id", spans["e"]), "ts", shift("user_id", spans["u"]),
            "event_type", "value", "props",
        ),
        "events", 32,
    )

    docs = src("documents")
    d_span = docs.agg((F.max("doc_id") + 1).alias("d")).collect()[0]["d"]
    marked = F.when(
        F.col("_c") == 0, F.col("text")
    ).otherwise(
        # per-copy word renaming: w -> w || 'q<i>' (1:1, structure-
        # preserving; see module docstring for why not a marker token)
        F.regexp_replace(
            F.col("text"), r"(\S+)",
            F.concat(F.lit("$1q"), F.col("_c").cast("string")),
        )
    )
    write(
        copies(docs).select(
            shift("doc_id", d_span), marked.alias("text"), "lang", "source",
            F.length(marked).alias("n_chars"),
        ),
        "documents", 8,
    )

    emb = src("embeddings")
    v_span = emb.agg((F.max("vec_id") + 1).alias("v")).collect()[0]["v"]
    dim = len(emb.select("embedding").first()["embedding"])
    rolled = F.when(F.col("_c") == 0, F.col("embedding")).otherwise(
        # np.roll by 6*_c as a slice+concat (pure Catalyst): permutations
        # preserve intra-copy dot products exactly
        F.concat(
            F.slice(F.col("embedding"), dim + 1 - (F.col("_c") * 6) % dim, (F.col("_c") * 6) % dim),
            F.slice(F.col("embedding"), 1, dim - (F.col("_c") * 6) % dim),
        )
    )
    write(
        copies(emb).select(shift("vec_id", v_span), rolled.alias("embedding"), "label"),
        "embeddings", 8,
    )

    li, orders, cust = src("lineitem"), src("orders"), src("customer")
    ok_span = orders.agg((F.max("o_orderkey") + 1).alias("k")).collect()[0]["k"]
    ck_span = cust.agg((F.max("c_custkey") + 1).alias("k")).collect()[0]["k"]
    write(
        copies(li).select(
            shift("l_orderkey", ok_span), "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ),
        "lineitem", 32,
    )
    write(
        copies(orders).select(
            shift("o_orderkey", ok_span), shift("o_custkey", ck_span),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        "orders", 16,
    )
    write(
        copies(cust).select(
            shift("c_custkey", ck_span), "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment",
        ),
        "customer", 8,
    )

    for t in ("region", "nation", "supplier", "part"):
        write(src(t), t, 1)

    print(f"scaled x{K} dataset at {args.dst}")
    spark.stop()


if __name__ == "__main__":
    main()
