"""Streaming as-of enrichment (streaming/asof.py).

Pins the semantics the gate relies on:
- backward-inclusive match in EVENT time regardless of arrival order
  (a left row matches the latest right row with ts <= its own, even
  when the right row arrives in a later micro-batch within the horizon);
- the remembered right row survives across micro-batches indefinitely
  (unbounded backward as-of) and re-enters the scan at its own event
  time, so a late-but-older right never shadows it;
- equal-ts ties: right row matches (inclusive), max tiebreak wins;
- right_ttl_ms expires idle keys' state.

Reference parity note: Scotty has no join operator (SURVEY.md §2.3) —
this is the training-pipeline extension plane.
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


_SEQ = [0]


def _run(spark, src, schema_df, tmp_path, **kw):
    from scotty_window_processor_spark.streaming.asof import asof_stream

    _SEQ[0] += 1
    name = f"asof_out_{_SEQ[0]}"
    stream = (
        spark.readStream.schema(spark.createDataFrame(schema_df).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = asof_stream(
        stream, key="k", ts="ts", side="side",
        left_cols=["seq"], right_cols=["rv"], tiebreak="seq", **kw
    )
    q = (
        out.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt{_SEQ[0]}"))
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    return {r.seq: (r.r_ts, r.r_rv) for r in spark.table(name).collect()}


def _pdf(rows):
    # rows: (k, ts_ms, side, seq, rv)
    return pd.DataFrame(
        {
            "k": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="ms"),
            "side": [r[2] for r in rows],
            "seq": [r[3] for r in rows],
            "rv": [r[4] for r in rows],
        }
    )


HOUR = 3_600_000
DAY = 24 * HOUR


def _flush(k="zz"):
    # far-future watermark advancer on an unrelated key
    return [(k, 400 * DAY, 0, 999, 0.0)]


def test_in_order_backward_match(spark, tmp_path):
    f1 = _pdf([("a", HOUR, 0, 1, 10.0), ("a", 2 * HOUR, 0, 2, 20.0)])
    f2 = _pdf([("a", 3 * HOUR, 1, 3, 0.0)])
    f3 = _pdf(_flush())
    got = _run(spark, _write_files(tmp_path, [f1, f2, f3]), f1, tmp_path)
    assert got[3][1] == 20.0


def test_right_state_survives_many_batches(spark, tmp_path):
    # right in file 1; lefts arrive 2 files later with a large ts gap —
    # unbounded backward: still matches
    f1 = _pdf([("a", HOUR, 0, 1, 7.0)])
    f2 = _pdf([("b", 100 * DAY, 0, 2, 1.0)])  # advances watermark far past f1
    f3 = _pdf([("a", 200 * DAY, 1, 3, 0.0)])
    f4 = _pdf(_flush())
    got = _run(spark, _write_files(tmp_path, [f1, f2, f3, f4]), f1, tmp_path)
    assert got[3][1] == 7.0


def test_out_of_order_within_horizon(spark, tmp_path):
    # left at t=3h and the right at t=2h arrive in the SAME batch with the
    # right physically after the left; the event-time scan still matches
    f1 = _pdf([("a", 3 * HOUR, 1, 1, 0.0), ("a", 2 * HOUR, 0, 2, 9.0)])
    f2 = _pdf(_flush())
    got = _run(spark, _write_files(tmp_path, [f1, f2]), f1, tmp_path)
    assert got[1][1] == 9.0


def test_late_older_right_does_not_shadow_remembered(spark, tmp_path):
    # remembered right at t=2h (finalized in batch 1); batch 2 delivers a
    # LATE right at t=1h together with a left at t=3h — the match must be
    # the remembered t=2h row, not the later-arriving older one
    f1 = _pdf([("a", 2 * HOUR, 0, 1, 20.0), ("b", 5 * HOUR, 0, 9, 0.0)])
    f2 = _pdf([("a", HOUR, 0, 2, 10.0), ("a", 3 * HOUR, 1, 3, 0.0)])
    f3 = _pdf(_flush())
    got = _run(spark, _write_files(tmp_path, [f1, f2, f3]), f1, tmp_path)
    assert got[3][1] == 20.0


def test_equal_ts_inclusive_max_tiebreak(spark, tmp_path):
    f1 = _pdf([
        ("a", HOUR, 0, 1, 1.0),
        ("a", HOUR, 0, 2, 2.0),   # same ts, higher tiebreak wins
        ("a", HOUR, 1, 3, 0.0),   # left at the same ts: inclusive
    ])
    f2 = _pdf(_flush())
    got = _run(spark, _write_files(tmp_path, [f1, f2]), f1, tmp_path)
    assert got[3][1] == 2.0


def test_no_preceding_right_is_null(spark, tmp_path):
    f1 = _pdf([("a", HOUR, 1, 1, 0.0), ("a", 2 * HOUR, 0, 2, 5.0)])
    f2 = _pdf(_flush())
    got = _run(spark, _write_files(tmp_path, [f1, f2]), f1, tmp_path)
    assert got[1] == (None, None)


def test_right_ttl_expires_idle_state(spark, tmp_path):
    # remembered right at t=1h, TTL 1 day. The watermark passes 1h+TTL in
    # batch 2; batch 3 (no data for key a) fires the key's TTL timer and
    # evicts its state. The left at t=60d then finds nothing — whereas
    # without the TTL it would match 7.0
    # (test_right_state_survives_many_batches pins that arm).
    f1 = _pdf([("a", HOUR, 0, 1, 7.0)])
    f2 = _pdf([("b", 50 * DAY, 0, 8, 0.0)])   # advances wm >> 1h + ttl
    f3 = _pdf([("b", 51 * DAY, 0, 9, 0.0)])   # a's timer fires: state dropped
    f4 = _pdf([("a", 60 * DAY, 1, 3, 0.0)])
    f5 = _pdf(_flush())
    got = _run(
        spark, _write_files(tmp_path, [f1, f2, f3, f4, f5]), f1, tmp_path,
        right_ttl_ms=DAY,
    )
    assert got[3] == (None, None)


# ---------------------------------------------------------------------------
# microsecond finalization (ADVICE r5) — handler-level, no streaming query


class _FakeState:
    """Minimal GroupState stand-in for driving _make_handler directly."""

    def __init__(self):
        self._v = None
        self.wm = 0
        self.timeout = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def getCurrentWatermarkMs(self):
        return self.wm

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, t):
        self.timeout = t


def _mk_us_handler():
    from scotty_window_processor_spark.streaming.asof import _make_handler

    buf_cols = ["k", "ts", "side", "tb", "lv", "rv"]
    out_names = ["k", "ts", "lv", "r_ts", "r_rv"]
    return _make_handler("ts", "side", ["lv"], ["rv"], "tb", None, out_names, buf_cols)


def _us_pdf(rows):
    import pandas as pd

    df = pd.DataFrame(rows, columns=["k", "ts", "side", "tb", "lv", "rv"])
    df["ts"] = pd.to_datetime(df["ts"])
    return df


def test_sub_ms_row_not_finalized_at_equal_ms_watermark():
    # A left row at 10.000800s must NOT finalize while wm == 10000 ms:
    # a right row at 10.000300s (equal millisecond, earlier microsecond)
    # is still admissible and precedes it in the batch-oracle order. The
    # old datetime64[ms] mask emitted the left in batch 1 with NULL right.
    handler = _mk_us_handler()
    st = _FakeState()

    st.wm = 10_000
    out = list(handler(("a",), [_us_pdf([("a", "1970-01-01 00:00:10.000800", 1, 1, 7.0, None)])], st))
    assert out == []                       # buffered, nothing emitted
    assert st.exists
    assert st.timeout == 10_001            # ceil-to-ms flush timer

    out = list(handler(("a",), [_us_pdf([("a", "1970-01-01 00:00:10.000300", 0, 1, None, 42.0)])], st))
    assert out == []                       # still ahead of the watermark

    st.wm = 10_001                         # watermark passes both
    out = list(handler(("a",), [], st))
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    assert row["lv"] == 7.0 and row["r_rv"] == 42.0
    assert row["r_ts"].microsecond == 300


def test_integral_ms_rows_finalize_exactly_as_before():
    # ms-granular data: the us-exact mask is bit-identical to the old
    # truncating mask — a row at exactly 10.000s finalizes at wm == 10000.
    handler = _mk_us_handler()
    st = _FakeState()
    st.wm = 10_000
    out = list(handler(("a",), [_us_pdf([
        ("a", "1970-01-01 00:00:09.000", 0, 1, None, 5.0),
        ("a", "1970-01-01 00:00:10.000", 1, 1, 3.0, None),
    ])], st))
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    assert row["lv"] == 3.0 and row["r_rv"] == 5.0
