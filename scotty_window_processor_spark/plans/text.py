"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All Catalyst expressions — whole-stage codegen,
column-pruned scans, no Python — chosen so each has an exact ANSI-SQL
oracle for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny, fixed stopword profiles for the n-gram/stopword language heuristic
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit", "ich", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
}

TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _words(text_col):
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-profile language scoring: count of profile words per
    language; predicted language = argmax (ties → 'und' undetermined)."""
    words = _words(F.col(text_col))

    def profile_score(stopwords):
        # one-arg lambda: a two-arg lambda would receive the array index as
        # the second argument from F.filter
        return F.size(F.filter(words, lambda w: w.isin(stopwords)))

    scores = {lang: profile_score(sw) for lang, sw in LANG_PROFILES.items()}
    best = None
    best_lang = F.lit("und")
    for lang, score in scores.items():
        if best is None:
            best, best_lang = score, F.when(score > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            best_lang = F.when(score > best, F.lit(lang)).otherwise(best_lang)
            best = F.greatest(score, best)
    return df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_PROFILES],
        best_lang.alias("pred_lang"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic document quality features + a composite score:
    length, word stats, stopword ratio, punctuation/digit density —
    the standard pre-training corpus filters (C4/Gopher-style rules)."""
    t = F.col(text_col)
    words = _words(t)
    n_chars = F.length(t)
    n_words = F.size(words)
    stop = F.size(F.filter(words, lambda w: w.isin(LANG_PROFILES["en"])))
    n_digits = n_chars - F.length(F.regexp_replace(t, "[0-9]", ""))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    avg_word_len = (n_chars - n_words + 1) / n_words
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(avg_word_len, 4).alias("avg_word_len"),
        F.round(stop / n_words, 4).alias("stopword_ratio"),
        F.round(n_digits / n_chars, 4).alias("digit_ratio"),
        F.round(n_punct / n_chars, 4).alias("punct_ratio"),
        (
            (n_words >= 10)
            & (avg_word_len >= 2)
            & (avg_word_len <= 12)
            & (n_digits / n_chars < 0.3)
        ).cast("int").alias("passes_quality"),
    )


def token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token estimate
    (letter runs, digit runs, single punctuation — the classic
    pre-tokenizer split)."""
    t = F.col(text_col)
    ws_tokens = F.size(_words(t))
    regex_tokens = F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0))
    return df.select(
        F.col(id_col),
        ws_tokens.alias("ws_tokens"),
        regex_tokens.alias("regex_tokens"),
        F.ceil(regex_tokens * 1.3).cast("long").alias("est_bpe_tokens"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5) -> DataFrame:
    """Document fingerprint: min/max of a 60-bit content hash over word
    n-grams (winnowing-style content signature, robust to reordering of
    unrelated docs; equal fingerprints ⇒ likely shared passages).

    Uses the portable md5-60 hash (plans.portable_hash) so the fingerprint
    is bit-identical in the DuckDB oracle."""
    from .portable_hash import md5_60

    words = _words(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: md5_60(F.array_join(F.slice(words, i + 1, n), " ")),
    )
    return df.select(
        F.col(id_col),
        F.array_min(grams).alias("fp_min"),
        F.array_max(grams).alias("fp_max"),
        F.size(grams).alias("n_grams"),
    )
