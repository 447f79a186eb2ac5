"""Deduplication operators for large-scale training-data pipelines.

All variants are pure DataFrame plans (no Python in the hot path) designed
around shuffle economics at 100 TB:

- exact:          one hash-groupBy on a digest; the digest (not the full
                  text) is the shuffle key, so shuffle bytes ≈ rows × 32B.
- ngram_jaccard:  explode shingle HASHES → self-join on the 8-byte hash →
                  pair-level Jaccard. The shingle join is the scalable
                  candidate generator (only docs sharing ≥1 shingle ever
                  meet); `max_shingle_df` prunes ubiquitous shingles to
                  kill the quadratic hot shingles — mandatory at scale.
- minhash_lsh:    shingle → K minhashes → B bands → band-bucket join.
                  Candidate pairs are verified with exact Jaccard. Hashes
                  are the PORTABLE md5-60 family (plans.portable_hash) so
                  the whole pipeline has a bit-exact DuckDB oracle.
- simhash:        60-bit simhash from portable word hashes; near-dups =
                  equal Hamming buckets on 15-bit rotated quarters
                  (pigeonhole-exact recall for hamming ≤ 3).
- embedding:      cosine near-dup over an embedding column (see
                  similarity.py for the ANN machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .portable_hash import MINHASH_P, md5_60, minhash_params


def normalized_text(col):
    """Canonical text form for exact dedup: lowercase, collapsed whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def let_(bound, body):
    """Let-binding for Catalyst expressions: evaluate ``bound`` ONCE per
    row and reference it many times inside ``body`` (a Column → Column
    function over the lambda variable).

    Why: splitting the computation across .select() projections does NOT
    guarantee single evaluation — CollapseProject merges adjacent
    projections and inlines the producer expression into every reference;
    inside a higher-order-function lambda that means re-evaluating the
    producer per array ELEMENT (measured 300× on the portable shingle
    chain: 0.7s → 238s at sf0.1). Binding through a one-element array +
    transform makes the producer a HOF argument, which Catalyst evaluates
    exactly once per row, and the lambda variable is a cheap reference."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the cluster has
    slots. CPU-heavy per-row projections (shingling, hashing, voting)
    otherwise run at the SCAN's parallelism, and a small parquet file is a
    single unsplittable row group → one task doing all the work. At real
    scale inputs have >> slots splits and this is a metadata no-op; the
    getNumPartitions() check is driver-side metadata, not a job."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    # At real scale the file index alone proves there are >= slots scan
    # splits (each file is at least one split), so the common path never
    # converts the plan to an RDD. Only when the index shows fewer files
    # than slots (tiny/local inputs, or a non-file source where
    # inputFiles() is empty) do we pay the driver-side RDD conversion to
    # learn the true split count.
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def materialize(df: DataFrame) -> DataFrame:
    """Cut the plan DAG by materializing ``df`` once (eager
    ``localCheckpoint``) so that EVERY downstream consumer reads the
    computed result instead of re-executing the producing subtree.

    Why: Spark physical plans are trees, not DAGs — a DataFrame consumed
    by two joins (e.g. the a/b sides of a candidate self-join, or a
    signature table probed by both ends of a pair) is *recomputed per
    consumer*, and ReuseExchange only kicks in when the exchanges are
    byte-identical after canonicalization (the aliased a/b sides are
    not). Measured on this repo's LSH pipeline: 4 full parquet scans +
    4 md5-shingle passes for one dedup_minhash_lsh call (see
    plans/r06/dedup_minhash_lsh_before.txt).

    The materialized frames here are the SMALL intermediates (signatures
    ≈ k×8 B/doc, candidate pairs, 8-byte simhashes) — never the corpus.
    On a real cluster with dynamic executors, swap for
    ``setCheckpointDir`` + ``.checkpoint()`` (localCheckpoint state dies
    with an executor); same semantics, same plan shape."""
    return df.localCheckpoint(eager=True)


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup groups: md5 over normalized text; keeps the min id as
    the canonical representative. Output: one row per distinct content,
    with the duplicate count. (A spread() repartition was measured here
    in r6 and reverted: one md5 per DOC is light enough that the
    round-robin exchange + extra stage cost more than the serialized
    scan-task projection saves — unlike the per-word/per-shingle chains
    in the near-dup plans, which keep spread().)"""
    return (
        df.select(F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dupes"))
    )


def word_shingles(text_col, n: int = 3):
    """Word-level n-gram shingles as an array<string> column (Catalyst-only).

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


def shingle_hash_docs(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingles: array<long>) — distinct 64-bit hashes of the word
    n-gram shingles, WITHOUT ever materialising the shingle strings.

    Each word is hashed ONCE into a materialised array column, then each
    shingle hash combines n word hashes (xxhash64 chains per-argument, so
    ('ab','c') and ('a','bc') cannot alias). A missing tail word is NULL
    (skipped by xxhash64), exactly mirroring concat_ws dropping it — the
    distinct-hash set is 1:1 with `word_shingles`' distinct-string set up
    to 64-bit collisions (~1e-9 at 10^6 distinct shingles; a collision
    only perturbs one intersection count).

    The word-hash array is let_-bound so it is computed exactly once per
    row — NOT re-inlined per gram element by CollapseProject (see let_)."""
    wh = F.transform(
        F.split(normalized_text(F.col(text_col)), " "), lambda x: F.xxhash64(x)
    )

    def grams(whv):
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(whv) - n + 1, F.lit(1))),
                lambda i: F.xxhash64(*[F.try_element_at(whv, i + k) for k in range(n)]),
            )
        )

    return df.select(F.col(id_col).alias("id"), let_(wh, grams).alias("shingles"))


# portable shingle-key parameters: two independent mod-P chains over the
# per-word hashes, packed into one 62-bit key (see portable_shingle_docs)
PACK = 1 << 31
CHAIN_A1 = 1_103_515_245
CHAIN_A2 = 69_069


def _chain_step(x, e, a: int):
    """One polynomial-hash step, NULL word (past-the-end) skipped — the
    arithmetic twin of concat_ws dropping a missing tail word. All
    intermediates < 2^62, so plain BIGINT in Spark AND DuckDB (DuckDB
    errors on signed-64 overflow, so staying under 63 bits is required,
    not just tidy)."""
    return F.when(e.isNull(), x).otherwise(
        ((x * F.lit(a)) % F.lit(MINHASH_P) + e) % F.lit(MINHASH_P)
    )


def portable_shingle_docs(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingles: array<long>) — distinct PORTABLE 62-bit shingle keys
    used where the output must be reproducible in the DuckDB oracle
    (MinHash/LSH).

    Instead of materialising shingle STRINGS and md5-ing each (string
    concat inside a higher-order function falls out of codegen — measured
    ~20s at sf0.1 vs ~1s for this), each WORD is md5-hashed once
    (mod P=2^31−1) and each shingle key is two independent polynomial
    chains over the n word hashes packed as k1·2^31 + k2: collision
    probability ~2^-62 per pair, pure BIGINT arithmetic in both engines.
    The identical formula lives in __spark_entry__._minhash_lsh_sql.
    The word-hash array is let_-bound (evaluated once per row; see let_)."""
    wh = F.transform(
        F.split(normalized_text(F.col(text_col)), " "),
        lambda x: F.pmod(md5_60(x), F.lit(MINHASH_P)),
    )

    def grams(whv):
        def gram(i):
            k1 = F.lit(0).cast("long")
            k2 = F.lit(0).cast("long")
            for k in range(n):
                e = F.try_element_at(whv, i + k)
                k1 = _chain_step(k1, e, CHAIN_A1)
                k2 = _chain_step(k2, e, CHAIN_A2)
            return k1 * F.lit(PACK) + k2

        return F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.greatest(F.size(whv) - n + 1, F.lit(1))), gram)
        )

    return df.select(F.col(id_col).alias("id"), let_(wh, grams).alias("shingles"))


def dedup_ngram_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 50,
) -> DataFrame:
    """Near-duplicate pairs by word n-gram Jaccard similarity ≥ threshold.

    Plan shape: explode(shingle hashes) → self-join on the hash (shuffle
    key = 8-byte hash, both sides identically partitioned) → per-pair
    intersection count → Jaccard from |A|+|B|−|∩|. ``max_shingle_df``
    (default 50) drops shingles occurring in more than that many docs —
    mandatory at scale (a stop-word shingle otherwise generates O(df²)
    candidate pairs); the oracle applies the identical df filter.

    Recall trade-off: a pair whose shared shingles ALL occur in more than
    ``max_shingle_df`` documents produces no candidate and is missed —
    this hits templated/boilerplate-heavy corpora hardest. Pass
    ``max_shingle_df=None`` for exact recall at small scale, or raise the
    cap; the default favors the 100 TB plan shape over tail recall.

    The (id, shingles, n_sh) table is materialized once (arrays of 8-byte
    hashes): the hot-shingle aggregate and the a/b sides of the shingle
    self-join otherwise each re-run the normalize + split + xxhash
    shingling subtree (3 corpus passes → 1)."""
    docs = materialize(
        shingle_hash_docs(spread(df), id_col, text_col, n).withColumn(
            "n_sh", F.size("shingles")
        )
    )

    # outer ≡ inner: shingle arrays are never null/empty (see
    # minhash_signatures), and outer skips the inferred size()>0 filter
    exploded = docs.select("id", "n_sh", F.explode_outer("shingles").alias("sh"))
    if max_shingle_df is not None:
        # anti-join against the HOT shingles only: the over-cap list is a
        # few rows (broadcast, no shuffle of the exploded side), vs an
        # inner join with the full ≤cap frequency table (which would
        # shuffle every exploded row a second time)
        hot = (
            exploded.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") > max_shingle_df)
            .select("sh")
        )
        exploded = exploded.join(F.broadcast(hot), "sh", "left_anti")

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


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, k: int = 32, n: int = 3) -> DataFrame:
    """K-permutation MinHash signature per doc: min over shingles of
    h_i(shingle) with the portable family h_i(x) = (a_i·x + b_i) mod P
    over md5-60 shingle hashes (see plans.portable_hash — every value is
    reproducible in ANSI SQL, so the LSH output is oracle-checkable).

    Plan shape: one md5 per distinct shingle at explode time, then k
    cheap modular transforms in one projection (whole-stage codegen) and
    one hash aggregate of k mins per doc.

    The explode is ``explode_outer``: Catalyst's InferFiltersFromGenerate
    rewrites a plain ``explode`` into Filter(size(arr) > 0 AND
    isnotnull(arr)) + Generate, and because the shingle array is a
    computed expression the pushed filter re-evaluates the whole md5 +
    polynomial-chain tree TWICE more per row (measured 8.2 s vs 1.5 s at
    sf1.0, 50 k docs — the guide-§4.4 duplicated-expression trap,
    Catalyst-side). The rule skips outer generates, and outer ≡ inner
    here because the shingle array is NEVER null or empty: grams() always
    emits ≥ 1 element (greatest(…, 1) floor), including for NULL text
    (the chain folds NULLs to the seed shingle, not to a NULL array)."""
    params = minhash_params(k)
    exploded = (
        portable_shingle_docs(spread(df), id_col, text_col, n)
        .select("id", F.explode_outer("shingles").alias("h"))
        .withColumn("hm", F.pmod(F.col("h"), F.lit(MINHASH_P)))
    )
    mins = exploded.groupBy("id").agg(
        *[
            F.min(F.pmod(F.col("hm") * F.lit(a) + F.lit(b), F.lit(MINHASH_P))).alias(f"h{i}")
            for i, (a, b) in enumerate(params)
        ]
    )
    return mins.select("id", F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig"))


def _band_buckets(sigs: DataFrame, k: int, bands: int, extra: tuple[str, ...] = ()) -> DataFrame:
    """(id, [extra...], band, bucket) — one row per (doc, band). The bucket
    join key is xxhash64 of the band's value string — Spark-internal only
    (both join sides use it identically; the oracle joins on its own band
    strings, and any xx-collision-induced candidate must still pass the
    downstream verify to reach the output)."""
    rows_per_band = k // bands
    # explode_outer: the band array is a non-empty literal array of
    # non-null structs, so outer ≡ inner — and the outer form keeps
    # InferFiltersFromGenerate from duplicating the per-band slice +
    # xxhash chain into a pushed size()>0 filter (see minhash_signatures)
    return sigs.select(
        "id",
        *extra,
        F.explode_outer(
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
    ).select("id", *extra, "bb.band", "bb.bucket")


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
    candidate generation never compares all pairs. Every hash is the
    portable md5-60/mod-P family, so the full candidate+verify pipeline
    has a bit-exact DuckDB oracle (see __spark_entry__._MINHASH_LSH).

    Cost shape (r6): the signature table is materialized once (k×8 B/doc)
    so the a/b self-join and the verify stage stop re-running the
    md5-shingle pipeline per consumer (4 full corpus passes → 1, guide
    §2.4 "remove shuffles/passes outright"), and the verify side shingles
    only docs that appear in a candidate pair (broadcast semi-join prune,
    guide §3.2) instead of shingling + broadcasting the whole corpus
    twice."""
    sigs = materialize(minhash_signatures(df, id_col, text_col, k, n))
    buckets = _band_buckets(sigs, k, bands)

    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    candidates = materialize(
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # verify candidates with exact Jaccard on the portable shingle-hash
    # arrays — computed ONLY for docs that occur in a candidate pair:
    # the candidate id set is tiny and already materialized, so the
    # semi-join broadcasts it and the filter lands before the shingle
    # projection (shingling cost ∝ candidates, not corpus)
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .union(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    docs = portable_shingle_docs(
        df.join(F.broadcast(cand_ids), id_col, "left_semi"), id_col, text_col, n
    )
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


SIMHASH_BITS = 60  # md5-60 word hashes → 60 usable sign bits


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """60-bit SimHash per doc from PORTABLE word hashes, all Catalyst.

    bit b of simhash = 1 iff Σ_words sign(bit b of md5_60(word)) > 0.
    md5-60 (plans.portable_hash) keeps every bit reproducible in the
    DuckDB oracle; duplicate words vote with multiplicity on both sides.

    Plan shape: explode(words) → ONE md5 per word in a projection → a
    hash aggregate of PACKED bit counters (map-side partials before the
    shuffle). The md5 must be materialised in its own projection:
    referencing it from every vote expression would re-evaluate it per
    bit per word (no cross-expression CSE in codegen — measured 10×
    end-to-end).

    Packed counters (r6): instead of 60 ``sum(CASE …)`` aggregates — a
    generated-code blob whose one-time janino compile measured ~2.3 s per
    process — three 20-bit set-bit counters ride in each of 20 summed
    longs (bit b = 3j+i lives in bits [20i, 20i+20) of p_j; summing longs
    adds the counters in parallel). The vote sign is recovered exactly:
    v_b = Σ±1 = 2·S_b − N, so bit b of the simhash is 1 iff
    2·S_b − N > 0 — identical integer arithmetic to the unpacked form,
    and the DuckDB oracle's per-bit vote reproduces it unchanged. A
    20-bit counter saturates at 2^20 words per document; a raise_error
    guard fails loudly far before silent corruption (docs that large
    should be chunked upstream anyway).

    explode_outer + an explicit NULL-text filter ≡ the plain explode
    (split() of a non-null string is never null/empty; a NULL text makes
    the array NULL, which inner explode drops — exactly what the cheap
    column filter does) while keeping InferFiltersFromGenerate from
    duplicating the normalize+split chain into a pushed filter (see
    minhash_signatures)."""
    words = spread(df).where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.explode_outer(F.split(normalized_text(F.col(text_col)), " ")).alias("word"),
    )
    hashed = words.select("id", md5_60(F.col("word")).alias("wh"))
    per_long = 3
    width = 20
    groups = -(-bits // per_long)
    def packed(j):
        terms = None
        for i in range(per_long):
            b = j * per_long + i
            if b >= bits:
                break
            t = F.shiftright(F.col("wh"), b).bitwiseAND(F.lit(1)).cast("long") * F.lit(
                1 << (width * i)
            )
            terms = t if terms is None else terms + t
        return terms

    votes = hashed.groupBy("id").agg(
        *[F.sum(packed(j)).alias(f"p{j}") for j in range(groups)],
        F.count(F.lit(1)).alias("_nw"),
    )
    mask = (1 << width) - 1
    sim = None
    for b in range(bits):
        j, i = b // per_long, b % per_long
        s_b = F.shiftright(F.col(f"p{j}"), width * i).bitwiseAND(F.lit(mask))
        # v_b = 2*S_b - N; disjoint bit positions: sum == bitwise OR
        bit = F.when(s_b * 2 - F.col("_nw") > 0, F.lit(1 << b)).otherwise(
            F.lit(0).cast("long")
        )
        sim = bit if sim is None else sim + bit
    guard = F.when(
        F.col("_nw") >= F.lit(1 << width),
        F.raise_error(
            F.lit("simhash packed counters saturate at 2^20 words per document")
        ).cast("long"),
    ).otherwise(sim)
    return votes.select("id", guard.alias("simhash"))


def dedup_simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3, tables: int = 4
) -> DataFrame:
    """SimHash near-dup pairs: bucket by 15-bit prefix under ``tables``
    rotations (any pair within Hamming distance ≤ tables−1 of a 60-bit
    hash shares at least one of the 4 15-bit quarters — pigeonhole), then
    verify exact Hamming. With the defaults (max_hamming=3, tables=4)
    recall is exact, not approximate."""
    if max_hamming > tables - 1:
        raise ValueError(
            f"pigeonhole recall guarantee needs max_hamming <= tables-1 "
            f"(got max_hamming={max_hamming}, tables={tables})"
        )
    quarter_bits = SIMHASH_BITS // tables
    mask = (1 << quarter_bits) - 1
    # materialize the (id, simhash) table (16 B/doc): the a/b sides of
    # the bucket self-join otherwise each re-run the explode + md5 +
    # 60-vote aggregate subtree (2 full corpus passes measured in
    # plans/r06/dedup_simhash_before.txt)
    sims = materialize(simhash(df, id_col, text_col))
    # one explode, not a unionAll of per-table selects: union branches each
    # re-run the whole 60-vote aggregate subplan (4 quarters × 2 join sides
    # = 8 recomputes; ~2× end-to-end measured), while the exploded form
    # computes it once per join side and the (tbl, bucket) exchanges reuse
    buckets = sims.select(
        "id",
        "simhash",
        # outer ≡ inner: non-empty literal array (see _band_buckets)
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.shiftright(F.col("simhash"), t * quarter_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "simhash", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

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


def dedup_incremental(
    new_docs: DataFrame,
    index_sigs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.35,
) -> DataFrame:
    """Incremental dedup: match a NEW batch of docs against a persisted
    signature INDEX of the existing corpus — the production dedup shape
    at 100 TB, where a daily ingest is deduped against petabytes of
    already-indexed corpus without re-shingling or re-LSHing any of it.

    ``index_sigs`` is (id, sig array<long>) as produced by
    ``minhash_signatures`` — ~`k`×8 bytes/doc, the only corpus state the
    operator touches (store it partitioned/bucketed by a band key to
    co-locate the join). Ids must be unique across index ∪ batch.

    Output: one row per duplicate pair involving a new doc —
    (id_new, id_match, match_src, est_jaccard) where match_src is
    'index' (new vs corpus) or 'batch' (new vs earlier-in-batch,
    oriented id_new < id_match). The keep-set for the ingest is the new
    ids with no output row (anti-join), and emitted rows feed the same
    ``dedup_cluster_canonical`` fold as the batch pipeline.

    Verification uses SIGNATURE AGREEMENT — est_jaccard = matching
    components / k, the standard unbiased MinHash Jaccard estimate —
    because the index deliberately stores no shingles; the cut is the
    integer ``matching >= ceil(threshold*k)`` so the whole pipeline
    stays bit-exact against a SQL oracle (no float comparison).

    Plan shape: signatures for the BATCH ONLY (the expensive shingle/
    hash work is proportional to the ingest, not the corpus), one
    explode to band buckets on both sides, one (band, bucket) equi-join
    — new-side bucket rows are batch-sized, so AQE broadcasts them
    against the index buckets — then a k-term zip_with agreement count
    in one projection. Nothing rescans corpus text.
    """
    min_match = -(-int(threshold * k * 1_000_000) // 1_000_000)  # ceil, float-safe
    new_sigs = minhash_signatures(new_docs, id_col, text_col, k, n)
    # materialize the combined signature table (k×8 B/doc): it feeds the
    # band-bucket explode AND both verify joins — without the cut, the
    # batch shingling (and any non-materialized index subtree) re-runs
    # once per consumer (4× measured at sf1.0)
    tagged = materialize(
        new_sigs.withColumn("is_new", F.lit(1)).unionByName(
            index_sigs.select("id", "sig").withColumn("is_new", F.lit(0))
        )
    )
    buckets = _band_buckets(tagged, k, bands, extra=("is_new",))

    a = buckets.select(
        F.col("id").alias("id_new"), F.col("is_new").alias("new_a"), "band", "bucket"
    ).where(F.col("new_a") == 1)
    b = buckets.select(
        F.col("id").alias("id_match"), F.col("is_new").alias("new_b"), "band", "bucket"
    )
    candidates = (
        a.join(b, ["band", "bucket"])
        .where(
            (F.col("new_b") == 0)
            | ((F.col("new_b") == 1) & (F.col("id_new") < F.col("id_match")))
        )
        .select(
            "id_new",
            "id_match",
            F.when(F.col("new_b") == 1, F.lit("batch")).otherwise(F.lit("index")).alias(
                "match_src"
            ),
        )
        .distinct()
    )

    sigs_all = tagged.select("id", "sig")
    return (
        candidates.join(
            sigs_all.withColumnRenamed("id", "id_new").withColumnRenamed("sig", "sig_a"),
            "id_new",
        )
        .join(
            sigs_all.withColumnRenamed("id", "id_match").withColumnRenamed("sig", "sig_b"),
            "id_match",
        )
        .withColumn(
            "match_comps",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)),
        )
        .where(F.col("match_comps") >= F.lit(min_match))
        .select(
            "id_new",
            "id_match",
            "match_src",
            F.round(F.col("match_comps") / F.lit(k), 6).alias("est_jaccard"),
        )
    )


def connected_components(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Connected components over an undirected pair list → (id, label) with
    label = the smallest node id in the component (deterministic canon).

    Min-label propagation with POINTER JUMPING: each round (a) every node
    takes the min of its own and its neighbours' labels (one join + one
    min-aggregate), then (b) label := label(label) (one self-join) — the
    union-find "halving" step that collapses label chains, so convergence
    is O(log diameter) rounds, not O(diameter) (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — the same alternating
    scheme GraphFrames uses). Near-dup clusters are near-cliques, so in
    practice 2-3 rounds close sf-scale graphs.

    Each round localCheckpoints the label frame: iterative self-joins
    otherwise stack lineage exponentially and re-execute every prior
    round per action. On a real cluster with dynamic executors use
    ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` instead
    (localCheckpoint state dies with an executor); semantics identical.

    Scale: shuffle bytes per round ≈ 2|E| + |V| longs on the id key; the
    pair list from LSH dedup is sparse (|E| ≪ corpus rows), so the whole
    loop is small next to the candidate-generation join that produced it.
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    # Scale the LOOP's shuffles to the edge list, not the session default:
    # the pair list from LSH dedup is orders of magnitude smaller than the
    # corpus (thousands of rows here vs a 64-partition session floor), and
    # each round runs 2 joins + an aggregate + a convergence count — at
    # the default width that is hundreds of near-empty tasks per round of
    # pure scheduling overhead. Derived from the materialized edge count
    # (~1 M edge-rows per partition, min 8), so a genuinely huge pair
    # list keeps a wide shuffle; restored via finally.
    spark = pairs.sparkSession
    n_edges = edges.count()
    loop_parts = str(int(min(max(8, n_edges // 1_000_000), 2048)))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_minp = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.minPartitionNum", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", loop_parts)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionNum", "1")
    try:
        label_t = labels.schema["label"].dataType
        for _ in range(max_iter):
            nbr = edges.join(labels.withColumnRenamed("id", "b"), "b").select(
                F.col("a").alias("id"), "label"
            )
            # own rows carry their round-start label as old_label (NULL on
            # neighbour rows; min() ignores NULLs and every id has exactly
            # one own row, so the agg recovers it) — the convergence check
            # below then reads the CHECKPOINTED frame instead of joining
            # new-vs-old labels, dropping one shuffle join + two exchanges
            # per round (guide §2.1; same `changed` value by construction)
            new = (
                labels.select("id", "label", F.col("label").alias("old_label"))
                .union(nbr.select("id", "label", F.lit(None).cast(label_t).alias("old_label")))
                .groupBy("id")
                .agg(F.min("label").alias("label"), F.min("old_label").alias("old_label"))
            )
            # pointer jump: label := label(label). Every label value is itself
            # a node id (labels start as ids and min() only selects ids), so
            # the self-join always hits; coalesce is belt-and-braces.
            jump = new.select(F.col("id").alias("label"), F.col("label").alias("plabel"))
            new = (
                new.join(jump, "label", "left")
                .select("id", F.coalesce("plabel", "label").alias("label"), "old_label")
                .localCheckpoint()
            )
            changed = new.where(F.col("label") != F.col("old_label")).count()
            labels = new.select("id", "label")
            if changed == 0:
                break
        else:
            _raise_cc_nonconvergence(max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_minp is not None:
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.minPartitionNum", prev_minp
            )
        else:
            spark.conf.unset("spark.sql.adaptive.coalescePartitions.minPartitionNum")
    return labels


def _raise_cc_nonconvergence(max_iter: int):
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pointer jumping makes this O(log diameter); a non-convergent "
        "input indicates label churn from a non-deterministic pair list"
    )


def dedup_cluster_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Cluster-level dedup canonicalization: fold a near-dup PAIR list into
    per-doc cluster assignments — the step that turns "these two docs are
    similar" into "keep exactly one doc per duplicate cluster".

    Output: one row per corpus doc — (doc_id, cluster_id, cluster_size,
    is_canonical) where cluster_id is the min doc id of the connected
    component (docs in no pair are their own singleton cluster) and
    is_canonical = 1 for the kept representative. Downstream keep-set =
    WHERE is_canonical = 1; transitivity is the point: A~B, B~C drops
    both B and C even when A~C was never emitted as a pair.

    The components frame is tiny next to the corpus (only docs that
    appear in a pair), so the assignment join is AQE-broadcastable; the
    size join groups on cluster_id (bounded by corpus rows).
    """
    cc = connected_components(pairs)
    assigned = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(cc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("label", F.col("doc_id")).alias("cluster_id"))
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return assigned.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        F.when(F.col("doc_id") == F.col("cluster_id"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_canonical"),
    )
