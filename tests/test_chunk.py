"""Per-document overlapping chunking (plans/chunk.py)."""

import pytest
from pyspark.sql import functions as F

from scotty_window_processor_spark.plans.chunk import chunk_documents
from spark_fixtures import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _chunks(spark, text, cw=4, ov=1):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        (r.chunk_idx, r.chunk_start_word, r.chunk_n_words, r.chunk_text)
        for r in chunk_documents(df, chunk_words=cw, overlap_words=ov).collect()
    )


def test_overlapping_layout(spark):
    got = _chunks(spark, "a b c d e f g h i j")
    assert got == [
        (0, 0, 4, "a b c d"),
        (1, 3, 4, "d e f g"),
        (2, 6, 4, "g h i j"),
    ]


def test_short_doc_single_chunk(spark):
    assert _chunks(spark, "x y") == [(0, 0, 2, "x y")]


def test_exact_boundary_no_empty_tail_chunk(spark):
    # n == chunk_words: exactly one chunk, no zero-word tail
    assert _chunks(spark, "a b c d") == [(0, 0, 4, "a b c d")]


def test_every_word_covered_and_short_tail_reported(spark):
    # n=6, cw=4, ov=1, stride=3 -> chunks at 0 and 3; tail is short (3)
    got = _chunks(spark, "a b c d e f")
    assert got == [(0, 0, 4, "a b c d"), (1, 3, 3, "d e f")]
    # coverage: union of [start, start+n_words) spans all 6 words
    covered = set()
    for _, s, n, _ in got:
        covered |= set(range(s, s + n))
    assert covered == set(range(6))


def test_normalization_matches_repo_standard(spark):
    # mixed case + collapsed whitespace, same chain as the dedup oracles
    got = _chunks(spark, "  A    b\tC  ", cw=2, ov=0)
    assert got == [(0, 0, 2, "a b"), (1, 2, 1, "c")]


def test_bad_overlap_raises(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_words=4, overlap_words=4)


def test_no_shuffle_in_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
