"""Streaming exact dedup (streaming/dedup.py).

Pins the two semantics the gate relies on:
- first-wins within the TTL horizon (duplicates across micro-batches are
  dropped; the kept row is the earliest-arriving one);
- TTL re-admission: a duplicate arriving after the watermark has passed
  first_ts + delay is a NEW row (state was evicted) — the property that
  bounds state by distinct-keys-per-horizon instead of stream length.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_fixtures import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _write_files(tmp_path, parts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, part in enumerate(parts):
        tbl = pa.Table.from_pandas(part, preserve_index=False)
        tbl = tbl.set_column(
            tbl.schema.get_field_index("ts"), "ts",
            tbl.column("ts").cast(pa.timestamp("us")),
        )
        pq.write_table(tbl, f"{src}/{i:04d}.parquet")
        os.utime(f"{src}/{i:04d}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))
    return src


def _run(spark, src, schema_df, delay, tmp_path, name):
    from scotty_window_processor_spark.streaming.dedup import stream_dedup_exact

    stream = (
        spark.readStream.schema(spark.createDataFrame(schema_df).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = stream_dedup_exact(stream, ["k"], ts="ts", delay=delay)
    q = (
        out.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name).collect()


def _pdf(rows):
    return pd.DataFrame(
        {
            "k": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="ms"),
            "seq": [r[2] for r in rows],
        }
    )


HOUR = 3_600_000


def test_first_wins_across_batches(spark, tmp_path):
    # key "a" appears in three files; only the first arrival survives
    f1 = _pdf([("a", HOUR, 0), ("b", HOUR + 1000, 1)])
    f2 = _pdf([("a", HOUR + 60_000, 2), ("c", HOUR + 61_000, 3)])
    f3 = _pdf([("a", HOUR + 120_000, 4), ("b", HOUR + 121_000, 5)])
    src = _write_files(tmp_path, [f1, f2, f3])
    rows = _run(spark, src, f1, "365 days", tmp_path, "dedup_first_wins")
    got = {r["k"]: r["seq"] for r in rows}
    assert got == {"a": 0, "b": 1, "c": 3}


def test_ttl_readmits_after_horizon(spark, tmp_path):
    # delay 1 min: a batch's eviction runs with the watermark set by the
    # PREVIOUS batch, so after file 2 advances event time to 2h, file 3's
    # batch runs with wm = 2h - 1min > a@1h + 1min and evicts "a"; the 4h
    # duplicate in file 4 is then re-admitted as a new first
    f1 = _pdf([("a", HOUR, 0)])
    f2 = _pdf([("wm", 2 * HOUR, 1)])
    f3 = _pdf([("wm2", 3 * HOUR, 2)])
    f4 = _pdf([("a", 4 * HOUR, 3)])
    src = _write_files(tmp_path, [f1, f2, f3, f4])
    rows = _run(spark, src, f1, "1 minute", tmp_path, "dedup_ttl")
    seqs = sorted(r["seq"] for r in rows if r["k"] == "a")
    assert seqs == [0, 3]
