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


@query("ext_sim_ivf_topk")  # rows-only: approximate retrieval
def ext_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: a KMeans coarse quantizer (Spark ML,
    JVM-side) partitions the corpus into cells; each query probes only
    its ``nprobe`` nearest cells and exact-cosine re-ranks inside them.

    The 100 TB architecture: centroids are a driver-side constant
    (k × dim floats), cell assignment is one ML transform over the
    corpus (ideally persisted as a partition column — then probing IS
    partition pruning), and per-query work is corpus_size × nprobe / k
    instead of corpus_size. Recall is tunable via nprobe.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    k_cells, nprobe = 16, 4
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    with_vec = corpus.withColumn("features", array_to_vector("embedding")).cache()
    # A coarse quantizer doesn't need a converged clustering: random
    # init + few iterations gives the same recall behavior (cells just
    # partition space) at a fraction of the fit cost. At 100 TB, fit on
    # a sample — the centroids are the only thing the corpus pass needs.
    model = KMeans(
        k=k_cells, seed=42, featuresCol="features", initMode="random", maxIter=5
    ).fit(with_vec)
    assigned = model.transform(with_vec).select(
        "vec_id", "embedding", F.col("prediction").alias("cell")
    ).cache()

    # 16 centroids fit on the driver; per-query probe cells are a tiny
    # literal table (n_queries × nprobe rows), broadcast into the join.
    import numpy as np

    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    q_rows = queries.collect()  # N_QUERIES rows — driver edge, by design
    probe_pairs = []
    for r in q_rows:
        qv = np.array(r["q_emb"])
        d = ((centroids - qv) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:nprobe]:
            probe_pairs.append((r["q_id"], int(cell)))
    probes = spark.createDataFrame(probe_pairs, "q_id long, cell int")

    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .join(F.broadcast(queries), "q_id")
        .filter(F.col("vec_id") != F.col("q_id"))
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
