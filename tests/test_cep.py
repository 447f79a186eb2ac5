"""CEP pattern matching: batch operator semantics + streaming parity.

Semantics under test (MATCH_RECOGNIZE core): L strictly consecutive rows
per key ordered by (ts, tiebreak), AFTER MATCH SKIP TO NEXT ROW
(overlapping matches allowed), optional within_ms span bound. The
streaming operator must emit each match exactly once — in the micro-batch
whose watermark finalizes the match's last row — and its total emissions
must equal the batch result.
"""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from scotty_window_processor_spark.plans.cep import match_pattern
from scotty_window_processor_spark.streaming.cep import cep_stream

from spark_fixtures import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _mk_events(spark, rows):
    """rows: (user_id, ts_ms, event_type, event_id)"""
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_ms", "event_type", "event_id"])
    pdf["ts"] = pd.to_datetime(pdf.pop("ts_ms"), unit="ms")
    return spark.createDataFrame(pdf)


FUNNEL = [
    lambda c: c["event_type"] == "a",
    lambda c: c["event_type"] == "b",
    lambda c: c["event_type"] == "c",
]


def _run_batch(df, within=None):
    return sorted(
        tuple(r)
        for r in match_pattern(
            df, key="user_id", ts="ts", steps=FUNNEL, step_cols=["event_type"],
            within_ms=within, tiebreak="event_id", capture=["event_id"],
        ).collect()
    )


def test_batch_basic_and_overlap(spark):
    # a b c a b c  -> two disjoint matches; a b a b c -> one (contiguity)
    rows = [
        (1, 1000, "a", 1), (1, 2000, "b", 2), (1, 3000, "c", 3),
        (1, 4000, "a", 4), (1, 5000, "b", 5), (1, 6000, "c", 6),
        (2, 1000, "a", 10), (2, 2000, "b", 11), (2, 2500, "a", 12),
        (2, 3000, "b", 13), (2, 4000, "c", 14),
    ]
    got = _run_batch(_mk_events(spark, rows))
    assert got == [
        (1, 1000, 3000, 1, 2, 3),
        (1, 4000, 6000, 4, 5, 6),
        (2, 2500, 4000, 12, 13, 14),
    ]


def test_batch_within_bound_and_key_isolation(spark):
    rows = [
        (1, 0, "a", 1), (1, 10_000, "b", 2), (1, 200_000, "c", 3),  # span 200s
        (2, 0, "b", 4), (2, 1000, "c", 5),  # pattern can't cross keys
    ]
    assert _run_batch(_mk_events(spark, rows), within=100_000) == []
    assert _run_batch(_mk_events(spark, rows), within=300_000) == [(1, 0, 200_000, 1, 2, 3)]


def test_batch_tiebreak_orders_equal_timestamps(spark):
    # same ts: event_id breaks the tie, so a(1) b(2) c(3) is contiguous
    rows = [(1, 5000, "a", 1), (1, 5000, "b", 2), (1, 5000, "c", 3)]
    assert _run_batch(_mk_events(spark, rows)) == [(1, 5000, 5000, 1, 2, 3)]


def _replay_stream(spark, rows, n_files, within=None, queryname="cep_out", sort_files=True):
    """Write rows one file per micro-batch (globally ts-sorted unless
    sort_files=False, which preserves the given order to exercise
    intra-batch disorder), run cep_stream, return (emissions, batch
    result)."""
    import tempfile

    src = tempfile.mkdtemp(prefix="cep_src_")
    ckpt = tempfile.mkdtemp(prefix="cep_ckpt_")
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_ms", "event_type", "event_id"])
    pdf["ts"] = pd.to_datetime(pdf.pop("ts_ms"), unit="ms")
    batch_df = spark.createDataFrame(pdf)

    # sentinel far past everything flushes all finalizations
    sent = pdf.iloc[:1].copy()
    sent["user_id"] = -1
    sent["ts"] = pdf["ts"].max() + pd.Timedelta(days=365)
    srt = pdf.sort_values("ts", kind="mergesort") if sort_files else pdf
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
    steps_py = [
        lambda d: d["event_type"].to_numpy() == "a",
        lambda d: d["event_type"].to_numpy() == "b",
        lambda d: d["event_type"].to_numpy() == "c",
    ]
    result = cep_stream(
        stream, key="user_id", ts="ts", steps=steps_py, step_cols=["event_type"],
        within_ms=within, tiebreak="event_id", capture=["event_id"],
        watermark_delay="1 second",
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
    want = _run_batch(batch_df.where(F.col("user_id") >= 0), within=within)
    return got, want


def test_stream_matches_batch_across_microbatches(spark):
    # matches spanning micro-batch boundaries: the a..b / b..c splits land
    # in different files, so state must carry the tail across triggers
    rows = [
        (1, 1_000, "a", 1), (1, 61_000, "b", 2), (1, 121_000, "c", 3),
        (1, 181_000, "a", 4), (1, 241_000, "b", 5), (1, 301_000, "c", 6),
        (2, 31_000, "a", 10), (2, 91_000, "b", 11), (2, 151_000, "x", 12),
        (2, 211_000, "a", 13), (2, 271_000, "b", 14), (2, 331_000, "c", 15),
    ]
    got, want = _replay_stream(spark, rows, n_files=5, queryname="cep_out_mb")
    assert len(want) == 3
    assert got == want


def test_stream_within_bound_parity(spark):
    rows = [
        (1, 0, "a", 1), (1, 50_000, "b", 2), (1, 400_000, "c", 3),
        (1, 500_000, "a", 4), (1, 520_000, "b", 5), (1, 540_000, "c", 6),
    ]
    got, want = _replay_stream(
        spark, rows, n_files=3, within=100_000, queryname="cep_out_within"
    )
    assert want == [(1, 500_000, 540_000, 4, 5, 6)]
    assert got == want


def test_stream_disordered_rows_within_watermark(spark):
    # rows arrive out of order inside a file; finalization sorts them
    rows = [
        (1, 2_000, "b", 2), (1, 1_000, "a", 1), (1, 3_000, "c", 3),
        (1, 64_000, "b", 5), (1, 63_000, "a", 4), (1, 65_000, "c", 6),
    ]
    got, want = _replay_stream(
        spark, rows, n_files=2, queryname="cep_out_ooo", sort_files=False
    )
    assert len(want) == 2
    assert got == want


def test_batch_single_step_pattern(spark):
    # L=1: every row satisfying the predicate is its own match
    rows = [(1, 1000, "a", 1), (1, 2000, "b", 2), (2, 3000, "a", 3)]
    got = sorted(
        tuple(r)
        for r in match_pattern(
            _mk_events(spark, rows), key="user_id", ts="ts",
            steps=[lambda c: c["event_type"] == "a"], step_cols=["event_type"],
            tiebreak="event_id", capture=["event_id"],
        ).collect()
    )
    assert got == [(1, 1000, 1000, 1), (2, 3000, 3000, 3)]


def test_stream_checkpoint_restart_no_dupes_no_gaps(spark, tmp_path):
    """Kill the CEP query mid-stream, restart from the checkpoint: total
    emissions equal the batch result with no duplicates (tail state and
    already-emitted bookkeeping survive the restart)."""
    import os as _os

    rows = [
        (1, 1_000, "a", 1), (1, 61_000, "b", 2), (1, 121_000, "c", 3),
        (1, 181_000, "a", 4), (1, 241_000, "b", 5), (1, 301_000, "c", 6),
        (2, 31_000, "a", 10), (2, 91_000, "b", 11), (2, 151_000, "c", 12),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_ms", "event_type", "event_id"])
    pdf["ts"] = pd.to_datetime(pdf.pop("ts_ms"), unit="ms")
    batch_df = spark.createDataFrame(pdf)
    srt = pdf.sort_values("ts", kind="mergesort")
    sent = srt.iloc[:1].copy()
    sent["user_id"] = -1
    sent["ts"] = srt["ts"].max() + pd.Timedelta(days=365)
    chunk = (len(srt) + 3) // 4
    chunks = [srt.iloc[i * chunk : (i + 1) * chunk] for i in range(4)] + [sent]
    chunks = [c for c in chunks if len(c)]

    src = str(tmp_path / "src"); _os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    def deliver(i):
        part = chunks[i]
        tbl = pa.Table.from_pandas(part, preserve_index=False)
        tbl = tbl.set_column(
            tbl.schema.get_field_index("ts"), "ts",
            tbl.column("ts").cast(pa.timestamp("us")),
        )
        tmp = f"{src}/._{i:04d}"
        pq.write_table(tbl, tmp)
        _os.utime(tmp, (1_700_000_000 + i, 1_700_000_000 + i))
        _os.rename(tmp, f"{src}/{i:04d}.parquet")

    steps_py = [
        lambda d: d["event_type"].to_numpy() == "a",
        lambda d: d["event_type"].to_numpy() == "b",
        lambda d: d["event_type"].to_numpy() == "c",
    ]

    from scotty_window_processor_spark.streaming.sink import ExactlyOnceParquetSink

    # the memory sink cannot recover from a checkpoint; the exactly-once
    # parquet sink is the production path and survives the restart
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))

    def start():
        stream = (
            spark.readStream.schema(batch_df.schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        result = cep_stream(
            stream, key="user_id", ts="ts", steps=steps_py,
            step_cols=["event_type"], tiebreak="event_id",
            capture=["event_id"], watermark_delay="1 second",
        )
        return (
            result.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt).outputMode("append").start()
        )

    for i in range(2):
        deliver(i)
    q = start()
    q.processAllAvailable()
    q.stop()  # crash after phase 1

    for i in range(2, len(chunks)):
        deliver(i)
    q = start()
    q.processAllAvailable()
    q.stop()

    emitted = [tuple(r) for r in sink.read_committed(spark).collect()]
    got = sorted(t for t in emitted if t[0] >= 0)
    assert len(got) == len(set(got)), "duplicate emissions across restart"
    want = sorted(
        tuple(r)
        for r in match_pattern(
            batch_df, key="user_id", ts="ts", steps=FUNNEL,
            step_cols=["event_type"], tiebreak="event_id", capture=["event_id"],
        ).collect()
    )
    assert len(want) == 3
    assert got == want


def test_batch_randomized_vs_bruteforce(spark):
    """Randomized differential: the lead()-family plan must equal a
    pure-Python brute-force matcher (sort per key, scan every start) on
    random streams across pattern lengths and span bounds."""
    import random

    rng = random.Random(42)
    for trial in range(8):
        L = rng.choice([1, 2, 3])
        within = rng.choice([None, 3_000, 10_000])
        n = rng.randint(5, 40)
        rows = [
            (rng.randint(1, 3), rng.randint(0, 20_000), rng.choice("abc"), i)
            for i in range(n)
        ]
        steps_syms = [rng.choice("abc") for _ in range(L)]

        # brute force: per key, order by (ts, event_id), scan every start
        per_key = {}
        for u, t, y, eid in rows:
            per_key.setdefault(u, []).append((t, eid, y))
        want = []
        for u, seq in per_key.items():
            seq.sort()
            for i in range(len(seq) - L + 1):
                if all(seq[i + j][2] == steps_syms[j] for j in range(L)):
                    if within is None or seq[i + L - 1][0] - seq[i][0] <= within:
                        want.append(
                            (u, seq[i][0], seq[i + L - 1][0])
                            + tuple(seq[i + j][1] for j in range(L))
                        )
        want.sort()

        steps = [
            (lambda sym: (lambda c: c["event_type"] == sym))(s) for s in steps_syms
        ]
        got = sorted(
            tuple(r)
            for r in match_pattern(
                _mk_events(spark, rows), key="user_id", ts="ts", steps=steps,
                step_cols=["event_type"], within_ms=within,
                tiebreak="event_id", capture=["event_id"],
            ).collect()
        )
        assert got == want, (trial, L, within, steps_syms)


def test_stream_capture_ts_column(spark, tmp_path):
    """The event-time column itself can be captured (batch parity: the
    batch operator always exposes ts to predicates and capture)."""
    import os as _os

    rows = [(1, 1_000, "a", 1), (1, 2_000, "b", 2), (1, 3_000, "c", 3)]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_ms", "event_type", "event_id"])
    pdf["ts"] = pd.to_datetime(pdf.pop("ts_ms"), unit="ms")
    sent = pdf.iloc[:1].copy()
    sent["user_id"] = -1
    sent["ts"] = pdf["ts"].max() + pd.Timedelta(days=1)
    src = str(tmp_path / "src"); _os.makedirs(src)
    for i, part in enumerate([pdf, sent]):
        tbl = pa.Table.from_pandas(part, preserve_index=False)
        tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts",
                             tbl.column("ts").cast(pa.timestamp("us")))
        pq.write_table(tbl, f"{src}/{i:04d}.parquet")
        _os.utime(f"{src}/{i:04d}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(spark.createDataFrame(pdf).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    result = cep_stream(
        stream, key="user_id", ts="ts",
        steps=[lambda d: d["event_type"].to_numpy() == "a",
               lambda d: d["event_type"].to_numpy() == "b"],
        step_cols=["event_type"], tiebreak="event_id",
        capture=["ts", "event_id"], watermark_delay="1 second",
    )
    ckpt = str(tmp_path / "ckpt")
    q = (result.writeStream.format("memory").queryName("cep_ts_cap")
         .option("checkpointLocation", ckpt).outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    out = spark.table("cep_ts_cap").where(F.col("user_id") >= 0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["w_start"] == 1_000 and r["w_end"] == 2_000
    assert r["s0_event_id"] == 1 and r["s1_event_id"] == 2
    assert r["s0_ts"] is not None and r["s1_ts"] is not None


def test_stream_tail_state_expires_with_span_bound(spark, tmp_path):
    """With within_ms set, an idle key's tail state must drain and be
    REMOVED once the span bound expires it (timer-fired wake, no new data
    for the key) — asserted via the state store's numRowsTotal metric."""
    import os as _os

    rows = [(1, 1_000, "a", 1), (1, 2_000, "b", 2), (1, 3_000, "c", 3),
            (2, 1_500, "a", 4), (2, 2_500, "b", 5), (2, 3_500, "c", 6)]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_ms", "event_type", "event_id"])
    pdf["ts"] = pd.to_datetime(pdf.pop("ts_ms"), unit="ms")
    # two sentinel files: the first advances the watermark far past every
    # span bound; the second triggers the micro-batch in which the
    # timer-fired wakes actually run (timers fire in the batch AFTER the
    # watermark update, and the file source only runs batches for files)
    s1 = pdf.iloc[:1].copy(); s1["user_id"] = -1
    s1["ts"] = pdf["ts"].max() + pd.Timedelta(days=1)
    s2 = s1.copy(); s2["ts"] = s1["ts"] + pd.Timedelta(days=1)
    src = str(tmp_path / "src"); _os.makedirs(src)
    for i, part in enumerate([pdf, s1, s2]):
        tbl = pa.Table.from_pandas(part, preserve_index=False)
        tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts",
                             tbl.column("ts").cast(pa.timestamp("us")))
        pq.write_table(tbl, f"{src}/{i:04d}.parquet")
        _os.utime(f"{src}/{i:04d}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(spark.createDataFrame(pdf).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    steps_py = [
        lambda d: d["event_type"].to_numpy() == "a",
        lambda d: d["event_type"].to_numpy() == "b",
        lambda d: d["event_type"].to_numpy() == "c",
    ]
    result = cep_stream(
        stream, key="user_id", ts="ts", steps=steps_py, step_cols=["event_type"],
        within_ms=10_000, tiebreak="event_id", capture=["event_id"],
        watermark_delay="1 second",
    )
    ckpt = str(tmp_path / "ckpt")
    q = (result.writeStream.format("memory").queryName("cep_expiry")
         .option("checkpointLocation", ckpt).outputMode("append").start())
    q.processAllAvailable()
    state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    q.stop()
    # both real keys matched (emitted) and their tails expired; at most
    # the final sentinel key's own entry may remain
    got = [tuple(r) for r in spark.table("cep_expiry").where(F.col("user_id") >= 0).collect()]
    assert len(got) == 2
    assert state_rows <= 1, f"idle-key tail state not expired: {state_rows} rows"


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_stream_randomized_parity(spark, seed):
    """Randomized stream-vs-batch parity across file splits: random event
    streams (with ts collisions broken by event_id) replayed through the
    streaming matcher must emit exactly the batch match set."""
    import random

    rng = random.Random(seed)
    n = rng.randint(20, 60)
    rows = [
        (rng.randint(1, 4), rng.randint(0, 300) * 1_000, rng.choice("abc"), i)
        for i in range(n)
    ]
    got, want = _replay_stream(
        spark, rows, n_files=rng.randint(2, 6),
        within=rng.choice([None, 60_000]),
        queryname=f"cep_rand_{seed}",
    )
    assert got == want
