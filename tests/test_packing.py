"""Deterministic sequence packing (plans/packing.py).

Contracts, in 100-TB order of importance:
- layout is content-addressed: byte-identical across repartitions and
  independent of input partitioning/order;
- within a shard, pack_start is a gapless exclusive cumsum: documents
  tile the concatenation exactly (no holes, no overlaps);
- chunk arithmetic (pack_seq / pack_cross) matches a brute-force
  recomputation;
- exactly ONE exchange (the shard key) feeds the window sort;
- DuckDB parity is carried by the ``pack_documents`` gate — here we pin
  the operator-level contracts the gate can't see.
"""

import pytest
from pyspark.sql import functions as F

from spark_fixtures import get_spark

SF = "/root/testdata/sf0.001"
CTX = 2048
SHARDS = 8


@pytest.fixture(scope="module")
def spark():
    return get_spark()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _packed(docs, **kw):
    from scotty_window_processor_spark.plans.packing import pack_sequences

    args = dict(id_col="doc_id", len_col="n_chars", context_len=CTX, n_shards=SHARDS)
    args.update(kw)
    return pack_sequences(docs, **args)


def test_pack_tiles_each_shard_exactly(spark, docs):
    """Sort a shard by pack_start: each doc must begin where the
    previous one ended — gapless, overlap-free tiling."""
    rows = _packed(docs).select("pack_shard", "pack_start", "n_chars").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["pack_shard"], []).append((r["pack_start"], r["n_chars"]))
    assert len(by_shard) == SHARDS
    for shard, docs_ in by_shard.items():
        docs_.sort()
        expect = 0
        for start, ln in docs_:
            assert start == expect, (shard, start, expect)
            expect = start + ln
        # total layout length == sum of lengths
        assert expect == sum(ln for _, ln in docs_)


def test_pack_chunk_arithmetic(spark, docs):
    for r in _packed(docs).collect():
        assert r["pack_seq"] == r["pack_start"] // CTX
        crosses = (r["pack_start"] + r["n_chars"] - 1) // CTX != r["pack_seq"]
        assert r["pack_cross"] == crosses
    # with 2048-char chunks and ~100-2000-char docs some must cross
    assert _packed(docs).where("pack_cross").count() > 0


def test_pack_stable_under_repartition(spark, docs):
    key = lambda df: sorted(
        (r["doc_id"], r["pack_shard"], r["pack_start"]) for r in df.collect()
    )
    assert key(_packed(docs)) == key(_packed(docs.repartition(17, "lang")))


def test_pack_drops_nonpositive_lengths(spark, docs):
    patched = docs.withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 7 == 0, F.lit(0)).otherwise(F.col("n_chars")),
    )
    out = _packed(patched)
    assert out.where("n_chars <= 0").count() == 0
    assert out.count() == patched.where("n_chars > 0").count()


def test_pack_single_exchange(spark, docs):
    plan = _packed(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_pack_validates_args(spark, docs):
    from scotty_window_processor_spark.plans.packing import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n_chars", 0)
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n_chars", 2048, n_shards=0)
