"""Per-conversation integrity audit (plans/relational.py).

Hand-model on a crafted conversation with every defect class the audit
reports (inversion, duplicate ts, over-gap session break, same-role
repeat), plus the plan contract: ONE exchange feeds both the lag()
window and the key-grain aggregation.
"""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_fixtures import get_spark

UTC = dt.timezone.utc


def _t(ms):
    return dt.datetime.fromtimestamp(ms / 1000, tz=UTC)


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_audit_hand_model(spark):
    from scotty_window_processor_spark.plans.relational import (
        transcript_integrity_audit,
    )

    base = 3_600_000
    rows = [
        # conv 1: in-order, one dup ts, one inversion, one 2h gap, a repeat
        Row(user_id=1, event_id=0, event_type="user", ts=_t(base)),
        Row(user_id=1, event_id=1, event_type="assistant", ts=_t(base + 1000)),
        Row(user_id=1, event_id=2, event_type="assistant", ts=_t(base + 1000)),  # dup + repeat
        Row(user_id=1, event_id=3, event_type="tool", ts=_t(base + 500)),  # inversion
        Row(user_id=1, event_id=4, event_type="user", ts=_t(base + 7_200_000)),  # gap
        # conv 2: single turn
        Row(user_id=2, event_id=5, event_type="user", ts=_t(base)),
    ]
    out = {
        r["user_id"]: r
        for r in transcript_integrity_audit(
            spark.createDataFrame(rows), gap_ms=1_800_000
        ).collect()
    }

    c1 = out[1]
    assert c1["n_turns"] == 5 and c1["n_kinds"] == 3
    assert c1["span_ms"] == 7_200_000
    assert c1["n_ts_inversions"] == 1 and c1["n_ts_dups"] == 1
    assert c1["max_gap_ms"] == 7_200_000 - 500
    assert c1["n_sessions"] == 2  # one gap beyond 30 min
    assert c1["n_kind_repeats"] == 1

    c2 = out[2]
    assert c2["n_turns"] == 1 and c2["n_sessions"] == 1
    assert c2["max_gap_ms"] is None and c2["span_ms"] == 0


def test_audit_single_exchange(spark):
    from scotty_window_processor_spark.plans.relational import (
        transcript_integrity_audit,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        transcript_integrity_audit(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the lag() window hash-partitions on the key once; the key-grain
    # aggregation reuses that partitioning instead of shuffling again
    assert plan.count("Exchange hashpartitioning") == 1


def test_audit_clean_stream_reports_zero_defects(spark):
    from scotty_window_processor_spark.plans.relational import (
        transcript_integrity_audit,
    )

    rows = [
        Row(user_id=9, event_id=i, event_type=["user", "assistant"][i % 2], ts=_t(3_600_000 + i * 60_000))
        for i in range(10)
    ]
    r = transcript_integrity_audit(spark.createDataFrame(rows)).first()
    assert r["n_ts_inversions"] == 0 and r["n_ts_dups"] == 0
    assert r["n_kind_repeats"] == 0 and r["n_sessions"] == 1
