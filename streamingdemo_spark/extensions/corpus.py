"""Corpus-shaping operators for training-data pipelines (SURVEY §2.F
north-star surface): n-gram statistics, length bucketing for batch
packing, sub-document (chunk-level) deduplication, and deterministic
reproducible corpus shuffling.

Like the rest of the extension layer these run over the ``documents``
fixture with JVM builtins on the hot path — token arrays are
materialized once per row before any lambda indexes them (the
re-evaluation gotcha documented at ``text.py:_shingles`` / SCALE.md),
and every corpus-wide step is a bounded groupBy/window, never an
all-pairs or driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import poly_hash, query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("documents",))["documents"]


@query(
    "ext_ngram_stats",
    oracle="""
    WITH tok AS (
      SELECT lang, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ), bg AS (
      SELECT lang,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM tok
    ), counts AS (
      SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram
    )
    SELECT lang, bigram, n, rn FROM
      (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY n DESC, bigram) AS rn
       FROM counts)
    WHERE rn <= 5
    """,
)
def ext_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram statistics: top-5 bigrams per language.

    The canonical distributed n-gram count: tokenize once, form
    adjacent-pair bigrams with a JVM higher-order function over the
    *materialized* token array, explode, then a two-level aggregate
    (map-side partial combine bounds the shuffle by bigram vocabulary,
    not corpus token count) and a windowed top-k. At 100 TB the only
    full-data pass is the scan+explode; everything after is
    vocabulary-sized.
    """
    with_toks = (
        _docs(spark, sf_dir)
        .select("lang", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    toks = F.col("toks")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        # element_at is 1-based, matching DuckDB's t[i]
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    counts = (
        with_toks.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return counts.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 5
    )


@query(
    "ext_length_bucket",
    oracle="""
    WITH d AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT (n_tok // 32) * 32 AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM((n_tok // 32) * 32 + 32 - n_tok) AS BIGINT) AS pad_waste
    FROM d GROUP BY bucket_lo
    """,
)
def ext_length_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length bucketing for batch packing: group documents into
    32-token-wide buckets and report, per bucket, the document count,
    total tokens, and the padding waste if every doc were padded to
    the bucket ceiling.

    This is the planning query behind length-bucketed batching (pack
    similar-length sequences together to cut pad-token waste). Pure
    integer arithmetic end-to-end — no float bucket boundaries that
    could flip between engines — and a single scan + small aggregate:
    output cardinality is max_len/32 rows regardless of corpus size.
    """
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    d = _docs(spark, sf_dir).select(n_tok.alias("n_tok"))
    bucket_lo = (F.floor(F.col("n_tok") / 32) * 32).cast("bigint")
    return (
        d.select("n_tok", bucket_lo.alias("bucket_lo"))
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(F.col("bucket_lo") + 32 - F.col("n_tok")).alias("pad_waste"),
        )
    )


@query(
    "ext_chunk_dedup",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), chunks AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, (len(t) + 31) // 32),
               k -> array_to_string(t[k * 32 + 1 : k * 32 + 32], ' ')))
               AS chunk
      FROM tok
    ), freq AS (
      SELECT chunk, COUNT(*) AS n FROM chunks GROUP BY chunk
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_chunks,
           ROUND(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS dup_ratio,
           SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END)
             <= 0.5 * COUNT(*) AS keep
    FROM chunks c JOIN freq f ON c.chunk = f.chunk
    GROUP BY c.doc_id
    """,
)
def ext_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document deduplication: split every document into 32-token
    chunks, count each chunk's global frequency, and flag documents
    whose duplicated-chunk ratio exceeds 50% (boilerplate-heavy pages
    whose *whole-doc* hash is unique but whose content is mostly
    copies — the case exact dedup misses and MinHash over-merges).

    Scale shape: chunks shuffle by chunk text for the frequency count
    (at 100 TB, substitute the 8-byte ``xxhash64(chunk)`` as the
    groupBy key as in ``ext_dedup_exact``), then one more shuffle by
    doc_id for the per-doc rollup. Both aggregates get map-side
    partial combine; nothing is quadratic in corpus size.
    """
    with_toks = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    n_chunks_expr = F.floor((F.size(toks) + 31) / 32).cast("int")
    chunk_list = F.transform(
        F.sequence(F.lit(0), n_chunks_expr - 1),
        lambda k: F.concat_ws(" ", F.slice(toks, k * 32 + 1, 32)),
    )
    chunks = with_toks.select(
        "doc_id", F.explode(chunk_list).alias("chunk")
    )
    freq = chunks.groupBy("chunk").agg(F.count("*").alias("n"))
    dup = F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
    return (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            dup.alias("dup_chunks"),
            F.round(dup / F.count("*").cast("double"), 4).alias("dup_ratio"),
            (dup <= 0.5 * F.count("*")).alias("keep"),
        )
    )


@query(
    "ext_doc_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   string_split(CAST(doc_id AS VARCHAR) || ':seed42', ''),
                   c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007) AS shuffle_key
      FROM documents
    )
    SELECT doc_id, source, shuffle_key,
           shuffle_key % 8 AS shard,
           ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS pos
    FROM keyed
    """,
)
def ext_doc_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle for reproducible training order:
    key every document with the portable hash of ``doc_id:seed``, emit
    its global position under that order plus an 8-way shard id.

    Seeded hash ordering is how a 100 TB corpus gets a reproducible
    "random" epoch order without materializing a random permutation:
    keying and sharding are pure projections, and changing the seed
    string re-shuffles without touching the data layout. The global
    ``pos`` here exists to make the full order — not just the row set
    — oracle-checkable; it is a single-reducer window like any total
    order. At scale, drop ``pos`` and write ``repartitionByRange(
    shuffle_key).sortWithinPartitions(shuffle_key)`` — readers consume
    shards in filename order and positions stay implicit, so nothing
    ever funnels through one task.
    """
    d = _docs(spark, sf_dir).select("doc_id", "source")
    key = poly_hash(F.concat(F.col("doc_id").cast("string"), F.lit(":seed42")))
    keyed = d.select("doc_id", "source", key.alias("shuffle_key"))
    w = Window.orderBy("shuffle_key", "doc_id")
    return keyed.select(
        "doc_id",
        "source",
        "shuffle_key",
        (F.col("shuffle_key") % 8).alias("shard"),
        F.row_number().over(w).alias("pos"),
    )
