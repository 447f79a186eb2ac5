"""Tests for incremental dedup: a new batch vs a persisted signature index.

Reference parity note: Scotty has no dedup operator (SURVEY.md §2.3) —
this is the training-pipeline extension plane; semantics are pinned by
construction (MinHash signature agreement over the portable md5-60
family, integer threshold cut).
"""

import pytest
from pyspark.sql import functions as F

from scotty_window_processor_spark.plans.dedup import (
    dedup_incremental,
    minhash_signatures,
)
from spark_fixtures import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


BASE = "the quick brown fox jumps over the lazy dog again and again today"
OTHER = "completely different content about spark shuffle partitioning internals"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """Index side: docs 1..3 (3 = same text as new doc 100), persisted to
    parquet and read back — the round-trip pins the index schema."""
    old = _docs(
        spark,
        [(1, BASE), (2, OTHER), (3, BASE + " extra")],
    )
    path = str(tmp_path_factory.mktemp("sigidx") / "index.parquet")
    minhash_signatures(old, "doc_id", "text", k=32, n=3).write.parquet(path)
    return spark.read.parquet(path)


def test_new_vs_index_exact_dup(spark, corpus):
    new = _docs(spark, [(100, BASE)])
    out = dedup_incremental(new, corpus, k=32, bands=8, threshold=0.35).collect()
    by_match = {r.id_match: r for r in out}
    assert 1 in by_match, out  # identical text -> all 32 components agree
    r = by_match[1]
    assert r.id_new == 100 and r.match_src == "index" and r.est_jaccard == 1.0
    assert 2 not in by_match  # unrelated content never pairs


def test_batch_internal_pair_oriented(spark, corpus):
    new = _docs(spark, [(100, BASE), (200, BASE)])
    out = dedup_incremental(new, corpus, k=32, bands=8, threshold=0.35)
    batch_rows = [r for r in out.collect() if r.match_src == "batch"]
    assert len(batch_rows) == 1
    assert (batch_rows[0].id_new, batch_rows[0].id_match) == (100, 200)
    assert batch_rows[0].est_jaccard == 1.0


def test_index_side_never_pairs_with_itself(spark, corpus):
    # docs 1 and 3 in the index are near-identical, but corpus-vs-corpus
    # pairs are the BATCH pipeline's job — incremental emits none
    new = _docs(spark, [(100, OTHER + " unrelated words entirely")])
    out = dedup_incremental(new, corpus, k=32, bands=8, threshold=0.35).collect()
    assert all(r.id_new == 100 for r in out)


def test_unrelated_new_doc_matches_nothing(spark, corpus):
    new = _docs(
        spark,
        [(100, "zebra quartz mosaic lantern pivot ember chalice nomad")],
    )
    assert dedup_incremental(new, corpus, k=32, bands=8).count() == 0


def test_integer_threshold_cut(spark, corpus):
    # threshold 1.0 -> min_match = 32: only exact-signature pairs survive
    new = _docs(spark, [(100, BASE), (200, BASE + " extra")])
    out = dedup_incremental(new, corpus, k=32, bands=8, threshold=1.0).collect()
    assert {(r.id_new, r.id_match) for r in out} >= {(100, 1)}
    assert all(r.est_jaccard == 1.0 for r in out)


def test_agreement_is_symmetric_estimate(spark, corpus):
    # est_jaccard is components-agree/k and identical whichever side is
    # new: doc 3's text as the new doc must estimate the same value
    # against doc 1 as doc 1's text does against doc 3
    a = dedup_incremental(_docs(spark, [(100, BASE + " extra")]), corpus, threshold=0.1)
    est_vs_1 = {r.id_match: r.est_jaccard for r in a.collect()}
    b = dedup_incremental(_docs(spark, [(100, BASE)]), corpus, threshold=0.1)
    est_vs_3 = {r.id_match: r.est_jaccard for r in b.collect()}
    assert est_vs_1[1] == est_vs_3[3]
