"""Deduplication operators (SURVEY §2.F): exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

The fixture corpus has no duplicates, so the near-dup keys plant
deterministic "mutant" copies derived from the fixture (a suffix of
tokens dropped / a component nudged) — detection quality is then
measurable (tests assert the planted pairs are recovered).

Scale design (the actual point of these operators at 100 TB):
- everything is hash → band → shuffle-on-bucket → verify-within-bucket;
  no all-pairs comparison ever materializes.
- hashes are Spark-native ``xxhash64`` (JVM codegen, no Python).
- candidate verification joins only within buckets, so the shuffle
  volume is O(n · bands), not O(n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import query

MUTANT_OFFSET = 1_000_000


def _docs_with_mutants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ near-dup mutants: every 5th doc re-appears with
    doc_id+1e6 and every 7th token dropped (≈86% token overlap)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = F.split("text", " ")
    mutated = F.array_join(
        F.filter(toks, lambda tok, i: (i % 7) != 0), " "
    )
    mutants = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + MUTANT_OFFSET)
        .withColumn("text", mutated)
    )
    return docs.unionByName(mutants)


@query(
    "ext_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
           MIN(lang) AS lang
    FROM (SELECT doc_id, lang, lower(trim(text)) AS norm FROM documents
          UNION ALL
          SELECT doc_id, lang, lower(trim(text)) AS norm FROM documents
          WHERE doc_id % 5 = 0)
    GROUP BY norm
    """,
)
def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized text, keep min doc_id.

    The duplicated-subset union makes real duplicate groups (n_copies=2)
    flow through. One shuffle on the normalized-text hash; at 100 TB,
    group by ``xxhash64(norm)`` instead of the full string to shrink
    shuffle keys (collision-checked within group).
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    dup_round = docs.filter(F.col("doc_id") % 5 == 0)
    both = docs.unionByName(dup_round)
    return (
        both.withColumn("norm", F.lower(F.trim(F.col("text"))))
        .groupBy("norm")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("lang").alias("lang"),
        )
        .drop("norm")
    )


def _shingles(text_col: str = "text", k: int = 3) -> Column:
    """k-token shingles as strings (word n-grams)."""
    toks = F.split(text_col, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))


def _minhash(shingles: Column, seed: int) -> Column:
    """One MinHash value: min over per-shingle seeded xxhash64."""
    return F.array_min(
        F.transform(shingles, lambda s: F.xxhash64(F.concat(s, F.lit(f"#{seed}"))))
    )


@query("ext_dedup_minhash")  # rows-only: hash values are engine-specific
def ext_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection via MinHash + LSH banding.

    Pipeline: 3-token shingles → 12 MinHashes → 6 bands × 2 rows →
    band-bucket self-join → candidate pairs → exact Jaccard verify.
    Output: (doc_a, doc_b, jaccard) with jaccard ≥ 0.5.

    100 TB: O(n·bands) shuffle; buckets with pathological size get
    capped (skew guard) — here sizes are tiny so the cap is a filter.
    """
    n_hashes, bands = 12, 6
    rows_per_band = n_hashes // bands
    docs = _docs_with_mutants(spark, sf_dir).select(
        "doc_id", _shingles().alias("sh")
    )
    sigs = docs.select(
        "doc_id",
        "sh",
        F.array(*[_minhash(F.col("sh"), s) for s in range(n_hashes)]).alias("sig"),
    )
    banded = sigs.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col("sig")[b * rows_per_band + r]
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect(F.array_distinct("sh_a"), F.array_distinct("sh_b")))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


@query("ext_dedup_simhash")  # rows-only: hash values are engine-specific
def ext_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit signature from per-token hash bit votes;
    candidates pair up when any of the 4 16-bit chunks match (hamming
    ≤ 3 verified exactly via popcount of XOR).

    All bit arithmetic is JVM-side integer ops — one explode + one
    groupBy for signatures, chunk-bucket join for candidates.
    """
    docs = _docs_with_mutants(spark, sf_dir)
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .withColumn("h", F.xxhash64("tok"))
    )
    # Bit votes: sum(+1/-1) per bit position, then reassemble the sign
    # bits into a 64-bit signature.
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(0)
    sigs = votes.select("doc_id", sig.alias("sig"))
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), 16 * c).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_no", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_no") == F.col("b.chunk_no"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


@query("ext_dedup_ngram_jaccard")  # rows-only: float similarity
def ext_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard within cheap blocking buckets: docs are
    blocked on (lang, token-count bucket) so only plausibly-similar
    pairs are compared — the blocked-verify pattern that keeps exact
    similarity affordable when LSH recall isn't enough."""
    docs = _docs_with_mutants(spark, sf_dir)
    with_sh = docs.select(
        "doc_id",
        "lang",
        F.array_distinct(_shingles(k=2)).alias("sh"),
        (F.size(F.split("text", " ")) / 32).cast("int").alias("len_bucket"),
    )
    a, b = with_sh.alias("a"), with_sh.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        # mutants lost 1/7 of tokens: allow adjacent length buckets
        & (F.col("b.len_bucket") - F.col("a.len_bucket")).between(0, 1)
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.4)
    )


@query("ext_dedup_embedding")  # rows-only: float cosine
def ext_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane (sign) LSH:
    8-bit sign sketch per vector → bucket join → exact cosine verify
    within buckets → pairs with cosine ≥ 0.99.

    Planted near-dups: every 4th vector re-appears (vec_id+1e6) with one
    component nudged, cosine ≈ 0.999.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    mutants = (
        emb.filter(F.col("vec_id") % 4 == 0)
        .withColumn("vec_id", F.col("vec_id") + MUTANT_OFFSET)
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda v, i: F.when(i == 0, v + F.lit(0.05)).otherwise(v),
            ),
        )
    )
    allv = emb.unionByName(mutants).select("vec_id", "embedding")

    # Deterministic pseudo-random hyperplanes: plane p weight for dim i
    # = sin(p*64+i) — fixed, engine-side, no RNG state.
    def plane_bit(p: int) -> Column:
        dot = F.aggregate(
            F.zip_with(
                "embedding",
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda i: F.sin(i + F.lit(p * 64)),
                ),
                lambda v, w: v * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.shiftleft(F.lit(1), p)).otherwise(0)

    sketch = sum([plane_bit(p) for p in range(8)], F.lit(0))
    sk = allv.withColumn("bucket", sketch)
    a, b = sk.alias("a"), sk.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.embedding"), F.col("b.embedding"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(side: str) -> Column:
        return F.sqrt(
            F.aggregate(
                F.col(f"{side}.embedding"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )

    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (norm("a") * norm("b")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.99)
    )
