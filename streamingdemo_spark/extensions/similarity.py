"""Similarity search over embeddings (SURVEY §2.F, BASELINE.json).

Two paths, as a large-scale ANN system would structure them:
- ``ext_sim_cosine_topk``: brute-force exact cosine top-k — the
  correctness baseline. Query side is tiny and broadcast; the corpus
  is scanned once, top-k per query via partitioned window.
- ``ext_sim_ann_lsh``: sign-LSH bucketed candidate generation + exact
  re-rank — the 100 TB path: candidate volume is O(n · tables), not
  O(n · queries), and buckets co-locate by shuffle key.

Vector math stays JVM-side (``zip_with``/``aggregate`` over
array<float>); for very high dims swap in a pandas-UDF dot product
(Arrow columnar batches) — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import query

N_QUERIES = 8
TOP_K = 5


def _dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(c: Column | str) -> Column:
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


def _corpus_and_queries(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    corpus = emb.select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    return corpus, queries


@query("ext_sim_cosine_topk")  # rows-only: float scores
def ext_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus,
    compute cosine JVM-side, keep k best per query with a partitioned
    window. One corpus scan, no shuffle of the corpus itself."""
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    scored = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("q_id")
    )
    cosine = F.round(
        _dot("embedding", "q_emb") / (_norm("embedding") * _norm("q_emb")), 4
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.select("q_id", "vec_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def _sign_sketch(emb_col: str, table: int, n_planes: int = 6) -> Column:
    """Deterministic random-hyperplane sketch (plane weights =
    sin(dim + offset), fixed per table) — n_planes sign bits packed into
    an int bucket id."""
    bits = []
    for p in range(n_planes):
        offset = (table * n_planes + p) * 64
        dot = F.aggregate(
            F.zip_with(
                emb_col,
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)), lambda i: F.sin(i + F.lit(offset))
                ),
                lambda v, w: v * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.shiftleft(F.lit(1), p)).otherwise(0))
    return sum(bits[1:], bits[0])


@query("ext_sim_ann_lsh")  # rows-only: approximate retrieval
def ext_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: L sign-LSH tables generate candidates (bucket equality in
    any table), exact cosine re-ranks them. Recall < 1 by construction;
    the test measures recall against the exact top-k.

    100 TB: corpus sketches are computed once per table and shuffled on
    (table, bucket) — candidate generation never touches raw pairs.
    """
    n_tables = 4
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    c_buckets = corpus.select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.array(*[_sign_sketch("embedding", t) for t in range(n_tables)])
        ).alias("tbl", "bucket"),
    )
    q_buckets = queries.select(
        "q_id",
        "q_emb",
        F.posexplode(
            F.array(*[_sign_sketch("q_emb", t) for t in range(n_tables)])
        ).alias("tbl", "bucket"),
    )
    cand = (
        c_buckets.join(F.broadcast(q_buckets), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "q_emb", "vec_id", "embedding")
        .dropDuplicates(["q_id", "vec_id"])
    )
    cosine = F.round(
        _dot("embedding", "q_emb") / (_norm("embedding") * _norm("q_emb")), 4
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.select("q_id", "vec_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )
