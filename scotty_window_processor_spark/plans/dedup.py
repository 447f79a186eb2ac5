"""Deduplication operators for large-scale training-data pipelines.

All variants are pure DataFrame plans (no Python in the hot path) designed
around shuffle economics at 100 TB:

- exact:          one hash-groupBy on a digest; the digest (not the full
                  text) is the shuffle key, so shuffle bytes ≈ rows × 32B.
- ngram_jaccard:  explode shingles → self-join on shingle → pair-level
                  Jaccard. The shingle join is the scalable candidate
                  generator (only docs sharing ≥1 shingle ever meet);
                  at scale add `min_shingle_df` pruning of ubiquitous
                  shingles to kill the quadratic hot shingles.
- minhash_lsh:    shingle → K minhashes → B bands → band-bucket join.
                  Candidate pairs are verified with exact Jaccard.
- simhash:        64-bit simhash from word hashes; near-dups = equal
                  Hamming buckets on rotated prefixes.
- embedding:      cosine near-dup over an embedding column (see
                  similarity.py for the ANN machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized_text(col):
    """Canonical text form for exact dedup: lowercase, collapsed whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup groups: md5 over normalized text; keeps the min id as
    the canonical representative. Output: one row per distinct content,
    with the duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dupes"))
    )


def word_shingles(text_col, n: int = 3):
    """Word-level n-gram shingles as an array column (Catalyst-only).

    Built with O(1) element_at lookups per position — a slice() inside
    transform() re-copies the array per element (O(len²) per doc and it
    falls out of codegen; ~25× slower measured)."""
    words = F.split(normalized_text(text_col), " ")
    grams = F.transform(
        words,
        lambda w, i: F.concat_ws(
            " ", w, *[F.try_element_at(words, i + k + 1) for k in range(1, n)]
        ),
    )
    # keep only full-length starts (concat_ws skips missing tail words);
    # degenerate docs shorter than n keep their single joined shingle
    return F.array_distinct(F.slice(grams, F.lit(1), F.greatest(F.size(words) - n + 1, F.lit(1))))


def dedup_ngram_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word n-gram Jaccard similarity ≥ threshold.

    Plan shape: explode(shingles) → self-join on shingle (shuffle key =
    shingle, both sides identically partitioned) → per-pair intersection
    count → Jaccard from |A|+|B|−|∩|. ``max_shingle_df`` drops shingles
    occurring in more than that many docs — mandatory at scale (a stop-word
    shingle otherwise generates O(df²) candidate pairs)."""
    docs = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("shingles")
    ).withColumn("n_sh", F.size("shingles"))

    # join on the shingle HASH, not the string: the shuffle key drops from
    # ~n-word strings to 8 bytes (64-bit collisions are ~1e-9 at 10^6
    # distinct shingles; a collision only perturbs one intersection count)
    exploded = docs.select("id", "n_sh", F.explode("shingles").alias("sh_str")).select(
        "id", "n_sh", F.xxhash64("sh_str").alias("sh")
    )
    if max_shingle_df is not None:
        freq = exploded.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
        exploded = exploded.join(freq.where(F.col("df_") <= max_shingle_df), "sh").drop("df_")

    a = exploded.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "sh")
    b = exploded.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "sh")
    pairs = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
        .withColumn("jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return pairs


def _hash_i(col, i: int):
    """Deterministic 64-bit hash family member i (xxhash64 with seed mix)."""
    return F.xxhash64(col, F.lit(i * 0x9E3779B9))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, k: int = 32, n: int = 3) -> DataFrame:
    """K-permutation MinHash signature per doc: min over shingles of
    hash_i(shingle).

    Plan shape: explode shingles once, hash each shingle k times in one
    projection (whole-stage codegen), then one hash aggregate of k mins per
    doc. (The alternative — k array_min(transform(...)) expressions over
    the shingle array — re-evaluates the shingle construction k times:
    ~50× slower in practice, no common-subexpression elimination across
    array elements.)"""
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), n)).alias("sh")
    )
    mins = exploded.groupBy("id").agg(
        *[F.min(_hash_i(F.col("sh"), i)).alias(f"h{i}") for i in range(k)]
    )
    return mins.select("id", F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig"))


def dedup_minhash_lsh(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified by exact Jaccard.

    bands × rows_per_band = k; a pair collides if any band's row-slice of
    the signature matches exactly. The band bucket id is the shuffle key —
    candidate generation never compares all pairs."""
    rows_per_band = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k, n)
    buckets = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    candidates = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # verify candidates with exact Jaccard (broadcast-friendly: candidate
    # set is tiny relative to the corpus)
    docs = df.select(F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("shingles"))
    verified = (
        candidates.join(docs.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(docs.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("union_", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("inter") / F.col("union_"))
        .where(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc from word hashes, all Catalyst.

    bit b of simhash = 1 iff Σ_words sign(bit b of xxhash64(word)) > 0."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    hashes = F.transform(words, lambda w: F.xxhash64(w))

    def bit_mask(b):
        # signed-64 representation: bit 63 is the sign bit
        return F.lit(1 << b if b < 63 else -(1 << 63))

    def vote_for_bit(b):
        # closure factory: extra default-arg lambda parameters change the
        # arity pyspark inspects and break higher-order functions
        mask = bit_mask(b)
        return F.aggregate(
            hashes, F.lit(0), lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1)
        )

    sim = None
    for b in range(bits):
        bit = F.when(vote_for_bit(b) > 0, bit_mask(b)).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return df.select(F.col(id_col).alias("id"), sim.alias("simhash"))


def dedup_simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3, tables: int = 4
) -> DataFrame:
    """SimHash near-dup pairs: bucket by 16-bit prefix under `tables`
    rotations (any pair within Hamming distance ≤3 of a 64-bit hash shares
    at least one of 4 16-bit quarters — pigeonhole), verify Hamming."""
    sims = simhash(df, id_col, text_col)
    quarters = [
        sims.select(
            "id", "simhash",
            F.lit(t).alias("tbl"),
            F.shiftright(F.col("simhash"), t * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
        )
        for t in range(tables)
    ]
    buckets = quarters[0]
    for q in quarters[1:]:
        buckets = buckets.unionAll(q)

    a = buckets.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "tbl", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "tbl", "bucket")
    pairs = (
        a.join(b, ["tbl", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs
