"""Unbounded possessive repetition: PATTERN (PRE MID+ POST) / (PRE MID*
POST) — batch gaps-and-islands vs a brute-force reference, and streaming
parity under the span-bound decidability protocol."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from scotty_window_processor_spark.plans.cep import match_pattern_plus
from scotty_window_processor_spark.streaming.cep import cep_stream_plus

from spark_fixtures import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _mk_events(spark, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_ms", "event_type", "event_id"])
    pdf["ts"] = pd.to_datetime(pdf.pop("ts_ms"), unit="ms")
    return spark.createDataFrame(pdf)


def _run_batch(df, pre, mid, post, within=None, min_repeats=1):
    return sorted(
        tuple(r)
        for r in match_pattern_plus(
            df, key="user_id", ts="ts",
            pre=lambda c: c["event_type"] == pre,
            plus=lambda c: c["event_type"] == mid,
            post=lambda c: c["event_type"] == post,
            step_cols=["event_type"], within_ms=within, tiebreak="event_id",
            min_repeats=min_repeats,
        ).collect()
    )


def _reference(rows, pre, mid, post, within=None, min_repeats=1):
    by_key = {}
    for u, t, e, i in rows:
        by_key.setdefault(u, []).append((t, i, e))
    out = []
    for u, evs in by_key.items():
        evs.sort()
        n = len(evs)
        for s in range(n):
            if evs[s][2] != pre:
                continue
            j = next((q for q in range(s + 1, n) if evs[q][2] != mid), None)
            if j is None:
                continue  # run unterminated: possessive match needs a post row
            k = j - s - 1
            if k < min_repeats or evs[j][2] != post:
                continue
            if within is not None and evs[j][0] - evs[s][0] > within:
                continue
            out.append((u, evs[s][0], evs[j][0], k))
    return sorted(out)


def test_batch_basic_plus(spark):
    rows = [
        (1, 1000, "a", 1), (1, 2000, "b", 2), (1, 3000, "b", 3),
        (1, 4000, "b", 4), (1, 5000, "c", 5),
        (2, 1000, "a", 6), (2, 2000, "c", 7),       # zero mids: fails MID+
        (3, 1000, "a", 8), (3, 2000, "b", 9), (3, 3000, "d", 10),  # wrong post
    ]
    got = _run_batch(_mk_events(spark, rows), "a", "b", "c")
    assert got == [(1, 1000, 5000, 3)]
    assert got == _reference(rows, "a", "b", "c")
    # MID*: key 2's zero-run now matches
    got0 = _run_batch(_mk_events(spark, rows), "a", "b", "c", min_repeats=0)
    assert got0 == [(1, 1000, 5000, 3), (2, 1000, 2000, 0)]
    assert got0 == _reference(rows, "a", "b", "c", min_repeats=0)


def test_batch_possessive_no_backtracking(spark):
    # a b b (post==mid char): the run consumes every 'b', so a 'b' can
    # never be the post row — possessive, documented
    rows = [(1, 1000, "a", 1), (1, 2000, "b", 2), (1, 3000, "b", 3)]
    assert _run_batch(_mk_events(spark, rows), "a", "b", "b") == []
    assert _reference(rows, "a", "b", "b") == []


def test_batch_unterminated_run_no_match(spark):
    rows = [(1, 1000, "a", 1), (1, 2000, "b", 2), (1, 3000, "b", 3)]
    assert _run_batch(_mk_events(spark, rows), "a", "b", "c") == []


def test_batch_within_bound(spark):
    rows = [(1, 0, "a", 1), (1, 1000, "b", 2), (1, 500_000, "c", 3)]
    assert _run_batch(_mk_events(spark, rows), "a", "b", "c", within=100_000) == []
    assert _run_batch(_mk_events(spark, rows), "a", "b", "c", within=600_000) == [
        (1, 0, 500_000, 1)
    ]


@pytest.mark.parametrize("seed", [5, 6, 7, 8])
def test_batch_randomized_vs_bruteforce(spark, seed):
    import random

    rng = random.Random(seed)
    n = rng.randint(20, 60)
    rows = [
        (rng.randint(1, 3), rng.randint(0, 200) * 1_000, rng.choice("abc"), i)
        for i in range(n)
    ]
    within = rng.choice([None, 60_000])
    mr = rng.choice([0, 1])
    got = _run_batch(_mk_events(spark, rows), "a", "b", "c", within=within, min_repeats=mr)
    want = _reference(rows, "a", "b", "c", within=within, min_repeats=mr)
    assert got == want


def _replay_plus(spark, rows, within, min_repeats, queryname):
    import tempfile

    src = tempfile.mkdtemp(prefix="cepp_src_")
    ckpt = tempfile.mkdtemp(prefix="cepp_ckpt_")
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_ms", "event_type", "event_id"])
    pdf["ts"] = pd.to_datetime(pdf.pop("ts_ms"), unit="ms")
    batch_df = spark.createDataFrame(pdf)

    sent = pdf.iloc[:1].copy()
    sent["user_id"] = -1
    sent["ts"] = pdf["ts"].max() + pd.Timedelta(days=365)
    srt = pdf.sort_values("ts", kind="mergesort")
    n_files = 4
    chunk = (len(srt) + n_files - 1) // n_files
    chunks = [srt.iloc[i * chunk : (i + 1) * chunk] for i in range(n_files)] + [sent]
    for i, part in enumerate(c for c in chunks if len(c)):
        tbl = pa.Table.from_pandas(part, preserve_index=False)
        tbl = tbl.set_column(
            tbl.schema.get_field_index("ts"), "ts",
            tbl.column("ts").cast(pa.timestamp("us")),
        )
        pq.write_table(tbl, f"{src}/{i:04d}.parquet")
        os.utime(f"{src}/{i:04d}.parquet", (1_000_000_000 + i, 1_000_000_000 + i))

    stream = (
        spark.readStream.schema(batch_df.schema).option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    result = cep_stream_plus(
        stream, key="user_id", ts="ts",
        pre=lambda d: d["event_type"].to_numpy() == "a",
        plus=lambda d: d["event_type"].to_numpy() == "b",
        post=lambda d: d["event_type"].to_numpy() == "c",
        step_cols=["event_type"], within_ms=within, tiebreak="event_id",
        min_repeats=min_repeats, watermark_delay="1 second",
    )
    q = (
        result.writeStream.format("memory").queryName(queryname)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r) for r in spark.table(queryname).where(F.col("user_id") >= 0).collect()
    )
    want = _run_batch(batch_df, "a", "b", "c", within=within, min_repeats=min_repeats)
    return got, want


def test_stream_plus_requires_within(spark):
    with pytest.raises(ValueError, match="within_ms"):
        cep_stream_plus(
            spark.readStream.format("rate").load(), key="value", ts="timestamp",
            pre=None, plus=None, post=None, step_cols=["event_type"], within_ms=None,
        )


def test_stream_plus_basic_parity(spark):
    rows = [
        (1, 1_000, "a", 1), (1, 31_000, "b", 2), (1, 61_000, "b", 3),
        (1, 91_000, "b", 4), (1, 121_000, "c", 5),
        (2, 1_000, "a", 6), (2, 31_000, "c", 7),
        (3, 1_000, "a", 8), (3, 31_000, "b", 9),  # unterminated tail run
    ]
    got, want = _replay_plus(spark, rows, within=600_000, min_repeats=1,
                             queryname="cepp_basic")
    assert got == want == [(1, 1_000, 121_000, 3)]


def test_stream_plus_run_spanning_microbatches(spark):
    """A run whose rows finalize across several micro-batches must defer
    until the terminator finalizes, then emit the full possessive run.
    (Rows start at 1h, not epoch 0: Spark's watermark filter drops a
    ts==0 row at watermark 0 — a test-data artifact, see test_quiesce.)"""
    base = 3_600_000
    rows = [(1, base + i * 30_000, "b" if 0 < i < 12 else ("a" if i == 0 else "c"), i)
            for i in range(13)]
    got, want = _replay_plus(spark, rows, within=10_000_000, min_repeats=1,
                             queryname="cepp_span")
    assert got == want == [(1, base, base + 12 * 30_000, 11)]


@pytest.mark.parametrize("seed", [21, 22, 23, 24, 25])
def test_stream_plus_randomized_parity(spark, seed):
    import random

    rng = random.Random(seed)
    n = rng.randint(15, 50)
    rows = [
        (rng.randint(1, 3), rng.randint(0, 200) * 1_000, rng.choice("abc"), i)
        for i in range(n)
    ]
    got, want = _replay_plus(
        spark, rows, within=60_000, min_repeats=rng.choice([0, 1]),
        queryname=f"cepp_rand_{seed}",
    )
    assert got == want
