"""Corpus-hygiene operators (plans/hygiene.py).

Operator-level contracts the oracle gates can't see, in 100-TB order of
importance:
- ``decontaminate`` never shuffles the corpus for the join (the eval
  side is a BroadcastExchange; the only regular Exchange is the final
  doc-grain aggregation), scores a verbatim eval copy 1.0, and scores 0
  against a disjoint eval set;
- ``pii_scrub`` is a zero-shuffle narrow projection with redaction and
  counts consistent per category;
- ``repetition_signals`` metrics match a hand-computed model on a small
  corpus, including the single-word-doc bigram edge;
- exact DuckDB parity is carried by the ``decontaminate`` / ``pii_scrub``
  / ``repetition_signals`` gates in __spark_entry__.py.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_fixtures import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


# ---------------------------------------------------------------------------
# decontaminate


def test_verbatim_eval_doc_scores_one(spark, docs):
    from scotty_window_processor_spark.plans.hygiene import decontaminate

    ev = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    out = decontaminate(docs, ev, n=3)
    # every doc that IS in the eval set is fully contained in it
    full = out.join(ev.select("doc_id"), "doc_id").agg(F.min("contamination")).first()[0]
    assert full == 1.0


def test_disjoint_eval_set_scores_zero(spark, docs):
    from scotty_window_processor_spark.plans.hygiene import decontaminate

    ev = spark.createDataFrame(
        [Row(doc_id=10**9, text="zzzz yyyy xxxx wwww vvvv uuuu")]
    )
    out = decontaminate(docs, ev, n=3)
    assert out.agg(F.max("contamination")).first()[0] == 0.0
    assert out.count() == docs.count()


def test_partial_containment_fraction(spark):
    from scotty_window_processor_spark.plans.hygiene import decontaminate

    # train doc = eval doc plus 4 novel words: 10 words → 8 trigrams,
    # eval doc 6 words → 4 trigrams, all 4 present in the train doc
    tr = spark.createDataFrame([Row(doc_id=1, text="a b c d e f q r s t")])
    ev = spark.createDataFrame([Row(doc_id=2, text="a b c d e f")])
    r = decontaminate(tr, ev, n=3, threshold=0.5).first()
    assert r["n_ngrams"] == 8 and r["n_matched"] == 4
    assert r["contamination"] == 0.5 and bool(r["contaminated"])


def test_decontaminate_broadcasts_eval_side(spark, docs):
    from scotty_window_processor_spark.plans.hygiene import decontaminate

    ev = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    plan = decontaminate(docs, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # at most two hash-partition exchanges: the tiny eval-side DISTINCT
    # and the final doc-grain aggregation — never a corpus-side join shuffle
    assert plan.count("Exchange hashpartitioning") <= 2


# ---------------------------------------------------------------------------
# pii_scrub


def test_pii_counts_and_redaction(spark):
    from scotty_window_processor_spark.plans.hygiene import pii_scrub

    rows = [
        Row(doc_id=1, text="mail bob@example.com and alice@test.org ok"),
        Row(doc_id=2, text="call 555-123-4567 or ssn 123-45-6789"),
        Row(doc_id=3, text="host 10.1.2.3 and 192.168.0.1 up"),
        Row(doc_id=4, text="nothing suspicious here"),
    ]
    out = {r["doc_id"]: r for r in pii_scrub(spark.createDataFrame(rows)).collect()}
    assert out[1]["n_email"] == 2 and out[1]["clean_text"] == "mail <EMAIL> and <EMAIL> ok"
    assert out[2]["n_phone"] == 1 and out[2]["n_ssn"] == 1
    assert out[2]["clean_text"] == "call <PHONE> or ssn <SSN>"
    assert out[3]["n_ipv4"] == 2 and out[3]["clean_text"] == "host <IPV4> and <IPV4> up"
    assert out[4]["n_email"] == out[4]["n_ipv4"] == 0
    assert out[4]["clean_text"] == "nothing suspicious here"


def test_pii_scrub_no_shuffle(spark, docs):
    from scotty_window_processor_spark.plans.hygiene import pii_scrub

    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# repetition_signals


def test_repetition_metrics_hand_model(spark):
    from scotty_window_processor_spark.plans.hygiene import repetition_signals

    rows = [
        Row(doc_id=1, text="spam spam spam eggs"),
        Row(doc_id=2, text="all words here differ"),
        Row(doc_id=3, text="solo"),
    ]
    out = {r["doc_id"]: r for r in repetition_signals(spark.createDataFrame(rows)).collect()}

    r1 = out[1]
    assert r1["n_words"] == 4 and r1["n_distinct_words"] == 2
    assert r1["dup_word_frac"] == 0.5
    assert r1["top_word"] == "spam" and r1["top_word_frac"] == 0.75
    # bigrams: "spam spam"×2, "spam eggs"×1
    assert r1["top_bigram"] == "spam spam" and round(r1["top_bigram_frac"], 6) == round(2 / 3, 6)

    r2 = out[2]
    assert r2["dup_word_frac"] == 0.0 and r2["top_word_frac"] == 0.25
    # all bigrams unique → modal tie broken lexicographically
    assert r2["top_bigram"] == "all words" and round(r2["top_bigram_frac"], 6) == round(1 / 3, 6)

    r3 = out[3]
    assert r3["n_words"] == 1 and r3["top_bigram"] is None
    assert r3["top_bigram_frac"] == 0.0


def test_repetition_control_byte_word_stays_a_word(spark):
    # ADVICE r5: normalization (lower+trim+collapse \s+) keeps control
    # bytes, so a word containing \x01 must still be counted in the WORD
    # family. The old \x01 bigram tag misclassified it as a bigram; the
    # space separator is unambiguous by construction (words come from
    # split on " ").
    from scotty_window_processor_spark.plans.hygiene import repetition_signals

    rows = [Row(doc_id=1, text="ab\x01cd ab\x01cd xy")]
    r = repetition_signals(spark.createDataFrame(rows)).collect()[0]
    assert r["n_words"] == 3 and r["n_distinct_words"] == 2
    assert r["top_word"] == "ab\x01cd" and round(r["top_word_frac"], 6) == round(2 / 3, 6)
    # bigrams "ab\x01cd ab\x01cd" / "ab\x01cd xy" tie at 1; lexicographic
    # tie-break on the space-joined token, exactly as the oracle orders
    assert r["top_bigram"] == "ab\x01cd ab\x01cd"
    assert r["top_bigram_frac"] == 0.5


def test_repetition_covers_every_doc(spark, docs):
    from scotty_window_processor_spark.plans.hygiene import repetition_signals

    assert repetition_signals(docs).count() == docs.count()


def test_repetition_plan_one_scan_two_exchanges(spark, docs):
    from scotty_window_processor_spark.plans.hygiene import repetition_signals

    plan = repetition_signals(docs)._jdf.queryExecution().executedPlan().toString()
    # words + bigrams ride one exploded frame: two hash exchanges total
    # (token-grain count, doc-grain collapse), no per-doc window, no join
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Window" not in plan and "Join" not in plan
    assert plan.count("Scan parquet") <= 1
