"""Corpus-hygiene operators for training-data pipelines: benchmark
decontamination, PII scrubbing, and repetition/boilerplate signals.

These close the gap between "deduplicated corpus" and "trainable corpus":

- ``decontaminate``     — flag training documents whose word n-grams
                          overlap a held-out evaluation set (the standard
                          train/test-contamination check before an LLM
                          training run).
- ``pii_scrub``         — count and redact e-mail addresses, IPv4
                          addresses, phone numbers, and SSN-like ids with
                          pure-Catalyst regex (no Python in the hot path).
- ``repetition_signals``— Gopher-style repetitiousness metrics per
                          document (duplicate-word fraction, top-word and
                          top-bigram mass) used as quality filters.

Shuffle economics at 100 TB:

- ``decontaminate`` never self-joins the corpus. The eval side (a
  benchmark suite — MiBs, not TBs) is reduced to a DISTINCT set of 8-byte
  shingle hashes and **broadcast**; the corpus side is one projection +
  explode + one hash aggregation back to doc grain. One shuffle total
  (the groupBy on doc id, with map-side partial aggregation), zero
  shuffles of corpus bytes for the join itself.
- ``pii_scrub`` is a narrow projection — zero shuffles, folds into the
  scan, whole-stage codegen end to end.
- ``repetition_signals`` explodes words/bigrams but aggregates by
  (doc, token) with partial aggregation before the exchange, so shuffle
  bytes are bounded by per-doc DISTINCT token counts, not corpus size;
  both token passes then collapse to doc grain and meet in a join on the
  doc id.

No reference equivalent (Scotty has no relational/text surface); this
plane belongs to the LLM-pipeline brief alongside dedup/similarity/text
(see plans/dedup.py, plans/text.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_text, shingle_hash_docs, spread

# ---------------------------------------------------------------------------
# decontamination


def eval_shingle_set(eval_df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """DISTINCT 8-byte word-n-gram hashes of the evaluation set — the
    broadcast side of ``decontaminate``. Benchmarks are tiny relative to
    a training corpus, so this set (8 bytes × distinct grams) fits in a
    broadcast even for very large eval suites."""
    # explode_outer ≡ explode (shingle arrays are never null/empty — see
    # plans.dedup.minhash_signatures) and keeps InferFiltersFromGenerate
    # from duplicating the shingle-hash chain into a pushed size() filter
    return (
        shingle_hash_docs(eval_df, id_col, text_col, n)
        .select(F.explode_outer("shingles").alias("sh"))
        .distinct()
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Per training document: what fraction of its distinct word
    ``n``-grams also occur anywhere in ``eval_df``?

    Output: (doc_id, n_ngrams, n_matched, contamination, contaminated)
    with ``contamination = n_matched / n_ngrams`` rounded to 6 decimals
    and ``contaminated = contamination >= threshold``. A fully-contained
    document (an eval question pasted into a training page) scores 1.0
    even when the surrounding page text differs — the property that makes
    n-gram decontamination stricter than whole-doc dedup.

    Plan shape: corpus → shingle-hash projection → explode → LEFT join
    against the **broadcast** distinct eval-gram set → one hash
    aggregation back to doc grain. The corpus is never shuffled for the
    join; the only exchange is the final groupBy on the doc id (partially
    aggregated map-side). Matching is on 64-bit xxhash shingle keys
    (collision odds ~1e-9 per distinct-gram pair — a collision perturbs
    one count by 1); the oracle joins the shingle *strings*, pinning the
    same counts independently."""
    ev = eval_shingle_set(eval_df, id_col, text_col, n).withColumn("hit", F.lit(1))
    docs = shingle_hash_docs(spread(train_df), id_col, text_col, n).withColumn(
        "n_ngrams", F.size("shingles")
    )
    return (
        # outer ≡ inner: non-null, non-empty shingle arrays (see above)
        docs.select("id", "n_ngrams", F.explode_outer("shingles").alias("sh"))
        .join(F.broadcast(ev), "sh", "left")
        .groupBy("id", "n_ngrams")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_matched"))
        .select(
            F.col("id").alias(id_col),
            "n_ngrams",
            "n_matched",
            F.round(F.col("n_matched") / F.col("n_ngrams"), 6).alias("contamination"),
            (F.col("n_matched") / F.col("n_ngrams") >= F.lit(threshold)).alias(
                "contaminated"
            ),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing

# Patterns are deliberately restricted to syntax with IDENTICAL semantics
# in Java regex (Spark) and RE2 (DuckDB oracle, Go/Rust tooling): no
# lookaround, no backreferences, only \b, \d, non-capturing groups.
PII_PATTERNS: Sequence[tuple[str, str, str]] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IPV4>"),
)


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Count and redact PII-shaped spans. Output: (doc_id, n_email,
    n_ssn, n_phone, n_ipv4, clean_text).

    Counts are measured per pattern on the ORIGINAL text (so overlapping
    categories are each reported); redaction applies the patterns in
    ``PII_PATTERNS`` order (email before ipv4, so a dotted-quad inside an
    e-mail host is reported under both counts but redacted as part of the
    e-mail span). SSN (xxx-xx-xxxx) and phone (xxx-xxx-xxxx) group shapes
    are disjoint, so their order is immaterial.

    Zero shuffles: a narrow projection that folds into the scan with
    predicate/column pruning intact — the correct shape for a pass that
    must touch every byte of a 100 TB corpus exactly once."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, token)
    return df.select(F.col(id_col), *counts, clean.alias("clean_text"))


# ---------------------------------------------------------------------------
# repetition / boilerplate signals


# separator joining bigram tokens so words and bigrams share ONE exploded
# frame / ONE aggregation pipeline. A space is unambiguous BY CONSTRUCTION:
# word tokens come from split(text, " ") and therefore can never contain
# one (a control-byte tag like \x01 was not — normalization collapses
# whitespace but keeps control bytes, so a real-world word containing
# \x01 would have been misclassified as a bigram; ADVICE r5). The space
# separator also makes the bigram token byte-identical to the oracle's
# space-joined bigram, so the min(struct(-cnt, tok)) lexicographic
# tie-break matches the oracle's ORDER BY tok ASC on ANY input text.
_BG_TAG = " "


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetitiousness metrics per document.

    Output: (doc_id, n_words, n_distinct_words, dup_word_frac, top_word,
    top_word_frac, top_bigram, top_bigram_frac). ``dup_word_frac`` is the
    fraction of word occurrences that are repeats of an earlier word
    (1 − distinct/total); ``top_*_frac`` is the mass of the single most
    frequent word / adjacent-word bigram — the signals quality pipelines
    threshold to drop boilerplate and degenerate repetition.

    Single-word documents have no bigram: top_bigram is NULL and
    top_bigram_frac is 0.0 (a one-word doc is trivially unrepetitive at
    bigram grain).

    Plan shape — ONE scan, TWO exchanges, no window, no join: words and
    tag-prefixed bigrams ride one explode into a (doc, token) count
    (exchange 1, map-side partial agg bounds shuffle rows by per-doc
    DISTINCT tokens), then one conditional aggregation to doc grain
    (exchange 2). The modal token with the lexicographic tie-break is
    ``min(struct(-count, token))`` — struct ordering gives highest count
    first, then smallest token — instead of a per-doc row_number window,
    which would add a full sort + another exchange per token family."""
    src = spread(df)
    words_arr = F.split(normalized_text(F.col(text_col)), " ")

    def words_and_bigrams(words):
        # adjacent (non-distinct) bigrams; empty array for single-word
        # docs — sequence(1, 0) would count DOWN, so the size guard is
        # load-bearing. ``words`` is the let_-bound lambda variable:
        # referencing the raw split() expression here would re-inline it
        # per bigram ELEMENT (CollapseProject; O(len²) splits per doc —
        # measured ~2× end-to-end at sf1.0, same trap as plans/dedup.let_)
        bi = F.when(F.size(words) < 2, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - 1),
                lambda i: F.concat_ws(
                    _BG_TAG, F.element_at(words, i), F.element_at(words, i + 1)
                ),
            )
        )
        return F.concat(words, bi)

    from .dedup import let_

    # explode_outer + NULL-text filter ≡ plain explode: for non-null text
    # the words⊕bigrams array has ≥ 1 element (split of any string is
    # non-empty), for NULL text the array is NULL and inner explode drops
    # the row — which the cheap column filter reproduces. Outer keeps
    # InferFiltersFromGenerate from re-evaluating the whole bigram chain
    # in a pushed size()>0 filter (guide §4.4 trap, Catalyst-side).
    toks = src.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode_outer(let_(words_arr, words_and_bigrams)).alias("tok")
    )
    counts = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("cnt"))
    is_bg = F.col("tok").contains(_BG_TAG)
    top = lambda cond: F.min(  # noqa: E731 — local plan shorthand
        F.when(cond, F.struct((-F.col("cnt")).alias("nc"), F.col("tok").alias("t")))
    )
    agg = counts.groupBy(id_col).agg(
        F.sum(F.when(~is_bg, F.col("cnt"))).alias("n_words"),
        F.count(F.when(~is_bg, F.lit(1))).alias("n_distinct_words"),
        top(~is_bg).alias("_tw"),
        F.sum(F.when(is_bg, F.col("cnt"))).alias("_bg_total"),
        top(is_bg).alias("_tb"),
    )
    return agg.select(
        F.col(id_col),
        "n_words",
        "n_distinct_words",
        F.round(1 - F.col("n_distinct_words") / F.col("n_words"), 6).alias(
            "dup_word_frac"
        ),
        F.col("_tw.t").alias("top_word"),
        F.round(-F.col("_tw.nc") / F.col("n_words"), 6).alias("top_word_frac"),
        # _BG_TAG is " ", so the stored token already IS the space-joined
        # bigram — no separator rewrite needed on output
        F.col("_tb.t").alias("top_bigram"),
        F.coalesce(
            F.round(-F.col("_tb.nc") / F.col("_bg_total"), 6), F.lit(0.0)
        ).alias("top_bigram_frac"),
    )
