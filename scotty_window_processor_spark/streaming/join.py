"""Stateful stream-stream joins over transcripts (north_rule requirement).

Built entirely on Spark's watermarked interval join: both sides declare
event-time watermarks and the join condition bounds the event-time gap,
so Spark can expire join state — state size is O(rate × interval), not
O(stream). The batch shape of the same join lives in
plans.relational.interval_self_join (used by the DuckDB oracle gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tool_call_result_join(
    transcripts: DataFrame,
    max_gap_seconds: int = 300,
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Match each tool-result turn with the turn that triggered it — the
    immediately preceding turn (``result_turn == call_turn + 1``) in the
    same conversation within ``max_gap_seconds``.

    Under the transcripts schema the tool name lives on the result
    (role='tool') turn, so the one-to-one "call → tool-result" relation is
    turn adjacency: the non-tool turn at ``result_turn - 1`` is the turn
    whose request the tool answered. The equi-keys (conv_id, turn
    adjacency) plus the bounded ts range make this a watermark-expirable
    stateful join (state is O(rate × gap)). Output: one row per
    (call, result) pair with the invoked tool and the call→result gap.
    """
    calls = (
        transcripts.where(F.col("role") != "tool")
        .withWatermark("ts", watermark_delay)
        .select(
            F.col("conv_id").alias("c_conv"),
            F.col("turn_idx").alias("call_turn"),
            F.col("ts").alias("call_ts"),
        )
    )
    results = (
        transcripts.where(F.col("role") == "tool")
        .withWatermark("ts", watermark_delay)
        .select(
            F.col("conv_id").alias("r_conv"),
            F.col("turn_idx").alias("result_turn"),
            F.col("tool").alias("result_tool"),
            F.col("ts").alias("result_ts"),
        )
    )
    joined = calls.join(
        results,
        (F.col("c_conv") == F.col("r_conv"))
        & (F.col("result_turn") == F.col("call_turn") + 1)
        & (F.col("result_ts") >= F.col("call_ts"))
        & (F.col("result_ts") <= F.col("call_ts") + F.expr(f"INTERVAL {max_gap_seconds} SECONDS")),
        "inner",
    )
    return joined.select(
        F.col("c_conv").alias("conv_id"),
        "call_turn",
        F.col("result_tool").alias("call_tool"),
        "result_turn",
        (F.unix_millis(F.col("result_ts").cast("timestamp")) - F.unix_millis(F.col("call_ts").cast("timestamp"))).alias("gap_ms"),
    )


def error_followup_join(
    events: DataFrame,
    window_seconds: int = 3600,
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Streaming twin of plans.relational.interval_self_join: purchases
    within an hour after an error, per user."""
    err = (
        events.where(F.col("event_type") == "error")
        .withWatermark("ts", watermark_delay)
        .select(F.col("user_id").alias("e_user"), F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts"))
    )
    pur = (
        events.where(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark_delay)
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("pur_ts"), F.col("value").alias("pur_value"))
    )
    return err.join(
        pur,
        (F.col("e_user") == F.col("p_user"))
        & (F.col("pur_ts") > F.col("err_ts"))
        & (F.col("pur_ts") <= F.col("err_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS")),
        "inner",
    ).select(F.col("e_user").alias("user_id"), "err_id", "pur_ts", "pur_value")
