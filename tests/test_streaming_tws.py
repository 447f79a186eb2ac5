"""Typed-state streaming operator (transformWithStateInPandas tier):
stream-vs-batch parity, pickle-tier equivalence, and checkpoint restart.
Requires the RocksDB state store provider (bundled with Spark 4)."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scotty_window_processor_spark.functions import CountAggregation, SumAggregation
from scotty_window_processor_spark.operators import (
    SessionWindow,
    SlidingWindow,
    TumblingWindow,
    WindowMeasure,
)
from scotty_window_processor_spark.plans.scotty_batch import scotty_window_aggregate
from scotty_window_processor_spark.sources import synthesize_transcripts, transcripts_schema
from scotty_window_processor_spark.streaming.tws import ROCKSDB_PROVIDER, scotty_stream_typed

from spark_fixtures import get_spark

try:
    from google.protobuf import descriptor  # noqa: F401
    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas needs the protobuf package for its "
    "state-server protocol; not present in this container (documented in "
    "BENCH/BASELINE.md). The shared state codec itself is exercised by "
    "tests/test_streaming.py through the typed applyInPandasWithState path.",
)

WINDOWS = lambda: [
    TumblingWindow(WindowMeasure.TIME, 600_000, window_id=1),
    SlidingWindow(WindowMeasure.TIME, 600_000, 300_000, window_id=2),
    SessionWindow(WindowMeasure.TIME, 300_000, window_id=3),
]
AGGS = [("turns", "long", CountAggregation), ("v", "double", SumAggregation)]


@pytest.fixture(scope="module")
def spark():
    s = get_spark()
    s.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    yield s


@pytest.fixture(scope="module")
def transcript_files(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("tws_src")
    df = synthesize_transcripts(
        spark, n_convs=10, turns_per_conv=40, n_hot_convs=1, hot_factor=5,
        disorder_pct=10, straggler_pct=0,
    )
    pdf = df.toPandas().sort_values("ts")
    n = len(pdf)
    chunk = (n + 4) // 5
    for i in range(5):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            tbl = pa.Table.from_pandas(part, preserve_index=False)
            tbl = tbl.set_column(
                tbl.schema.get_field_index("ts"), "ts",
                tbl.column("ts").cast(pa.timestamp("us")),
            )
            pq.write_table(tbl, str(base / f"{i:04d}.parquet"))
    return str(base), pdf


def _read_stream(spark, src_dir, files_per_trigger=1):
    return (
        spark.readStream.schema(transcripts_schema())
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )


def test_typed_state_matches_batch(spark, transcript_files, tmp_path):
    src_dir, pdf = transcript_files
    result = scotty_stream_typed(
        _read_stream(spark, src_dir), key="conv_id", ts="ts", value="turn_idx",
        windows=WINDOWS(), aggs=AGGS, watermark_delay="30 seconds", lateness_ms=30_000,
    )
    q = (
        result.writeStream.format("memory").queryName("tws_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["conv_id"], r["window_id"], r["w_start"], r["w_end"], r["turns"], round(r["v"], 6))
        for r in spark.table("tws_out").collect()
    }
    assert got, "typed-state stream emitted nothing"

    batch = scotty_window_aggregate(
        spark.read.parquet(src_dir), key="conv_id", ts="ts", value="turn_idx",
        windows=WINDOWS(),
        aggs=[("turns", "long", CountAggregation), ("v", "double", SumAggregation)],
        lateness_ms=30_000,
    )
    final_wm = int(pdf["ts"].max().value // 10**6) - 30_000
    expected = {
        (r["conv_id"], r["window_id"], r["w_start"], r["w_end"], r["turns"], round(r["v"], 6))
        for r in batch.collect() if r["w_end"] < final_wm
    }
    missing = expected - got
    assert not missing, f"typed stream missed {len(missing)} windows: {sorted(missing)[:5]}"
    got_closed = {g for g in got if g[3] < final_wm}
    extra = got_closed - expected
    assert not extra, f"typed stream emitted wrong windows: {sorted(extra)[:5]}"


def test_typed_state_restart_resumes_from_checkpoint(spark, transcript_files, tmp_path):
    src_all, pdf = transcript_files
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    files = sorted(glob.glob(os.path.join(src_all, "*.parquet")))

    def deliver(f, seq):
        tmp_name = os.path.join(src_dir, "._" + os.path.basename(f))
        dst = os.path.join(src_dir, os.path.basename(f))
        shutil.copy(f, tmp_name)
        os.utime(tmp_name, (1_700_000_000 + seq, 1_700_000_000 + seq))
        os.rename(tmp_name, dst)

    ckpt = str(tmp_path / "ckpt")

    def start(name):
        result = scotty_stream_typed(
            _read_stream(spark, src_dir), key="conv_id", ts="ts", value="turn_idx",
            windows=[TumblingWindow(WindowMeasure.TIME, 600_000, window_id=1)],
            aggs=AGGS, watermark_delay="30 seconds", lateness_ms=30_000,
        )
        return (
            result.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", ckpt).outputMode("append").start()
        )

    for i, f in enumerate(files[:2]):
        deliver(f, i)
    q = start("tws_r1")
    q.processAllAvailable()
    q.stop()  # "crash" mid-stream

    for i, f in enumerate(files[2:]):
        deliver(f, 2 + i)
    q = start("tws_r2")
    q.processAllAvailable()
    q.stop()

    rows = [
        *spark.table("tws_r1").collect(),
        *spark.table("tws_r2").collect(),
    ]
    keys = [(r["conv_id"], r["window_id"], r["w_start"], r["w_end"]) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate windows across restart"

    batch = scotty_window_aggregate(
        spark.read.parquet(src_dir), key="conv_id", ts="ts", value="turn_idx",
        windows=[TumblingWindow(WindowMeasure.TIME, 600_000, window_id=1)],
        aggs=AGGS, lateness_ms=30_000,
    )
    final_wm = int(pdf["ts"].max().value // 10**6) - 30_000
    expected = {
        (r["conv_id"], r["window_id"], r["w_start"], r["w_end"], r["turns"])
        for r in batch.collect() if r["w_end"] < final_wm
    }
    got = {(r["conv_id"], r["window_id"], r["w_start"], r["w_end"], r["turns"]) for r in rows}
    missing = expected - got
    assert not missing, f"restart lost {len(missing)} closed windows: {sorted(missing)[:5]}"
