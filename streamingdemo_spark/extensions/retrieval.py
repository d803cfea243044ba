"""Retrieval scoring over the documents/embeddings corpus (SURVEY
§2.F north-star surface): BM25 lexical ranking and reciprocal-rank
hybrid fusion — the ranking half of a RAG / retrieval-augmented
training-data pipeline, next to ``ext_text_tfidf`` (term weighting)
and ``ext_sim_cosine_topk`` (dense scoring).

Reference parity note: the reference's query surface is its SQL entry
point (``src/sparkSQL/SparkSQLOperator.java:18-19``); these keys are
north-star extensions beyond it, per SURVEY §2.F.

Portability: BM25 is log/division-heavy, so per-(doc, term) scores are
quantized to integer micro-units (``floor(x*1e6 + 0.5)``) BEFORE the
per-doc sum — the same integer-sketch discipline as
``ext_unigram_surprisal`` — making every aggregate an exact int64 sum:
order-insensitive, bitwise-reproducible, replayed exactly by the
DuckDB oracle. Rank fusion then never touches a float at all:
``1e9 div (k + rank)`` is pure integer arithmetic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import query

# The standing query: one frequent, one mid, one rare corpus term
# (df ≈ 385 / 387 / 25 of 500 docs at sf0.01), so idf actually spreads
# the scores instead of degenerating to tf ordering.
QUERY_TERMS = ("spark", "window", "dup")
_TERMS_SQL = "('spark', 'window', 'dup')"

K1 = 1.2  # BM25 term-frequency saturation
B = 0.75  # BM25 length normalization
TOP_N = 10
RRF_K = 60  # standard reciprocal-rank-fusion damping
QUERY_DOC = 7  # its embedding stands in for the query's dense vector


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("documents",))["documents"]


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25_micro) for every document matching ≥1 query term.

    Shape: one scan tokenizes and carries the doc length alongside the
    explode; the query-term filter drops ~90% of tokens BEFORE the
    (doc, term) aggregate, so the shuffle is bounded by matches, not
    corpus tokens. df (per query term) and the corpus totals are
    tiny aggregates of that same matched set / the doclen relation,
    joined back as broadcast 1-row/3-row relations — no driver-side
    ``count()`` actions, the whole thing is one job. At 100 TB nothing
    here grows beyond (matched docs × |query|) except the initial scan.

    Float discipline: every double op in the score is written in the
    exact same shape as the oracle SQL (same literals, same
    parenthesization), so both engines execute the same IEEE-754
    sequence; the only transcendental is ln() whose cross-engine ulp
    the 1e-6 micro-grid absorbs (margin pinned by
    tests/test_portable_hash.py::test_bm25_floor_boundary_margin).
    """
    d = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    doclen = d.select("doc_id", F.size("toks").alias("dl"))
    tot = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("dl_sum")
    )
    tf = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # idf = ln(1 + (N - df + 0.5)/(df + 0.5)); tf-norm denominator uses
    # dl/avgdl as (dl*N)/dl_sum — one exact-integer-arg division
    # instead of a chained avgdl rounding step
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfn = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf")
        + K1
        * (
            (1.0 - B)
            + B
            * ((F.col("dl") * F.col("n_docs")).cast("double") / F.col("dl_sum"))
        )
    )
    micro = F.floor(idf * tfn * 1000000 + F.lit(0.5)).alias("micro")
    scored = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", micro)
    )
    return scored.groupBy("doc_id").agg(F.sum("micro").alias("bm25_micro"))


_BM25_ORACLE_CTE = f"""
    d AS (SELECT doc_id, len(string_split(text, ' ')) AS dl
          FROM documents),
    tot AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS dl_sum FROM d),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      WHERE term IN {_TERMS_SQL}
      GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT tf.doc_id,
             CAST(FLOOR(
               ln(1 + (tot.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
               * ((tf.tf * {K1 + 1.0}) /
                  (tf.tf + {K1} * (({1.0 - B}) + {B} *
                   (CAST(d.dl * tot.n_docs AS DOUBLE) / tot.dl_sum))))
               * 1000000 + 0.5) AS BIGINT) AS micro
      FROM tf
      JOIN d USING (doc_id)
      JOIN dfq USING (term)
      CROSS JOIN tot
    ),
    bm25 AS (
      SELECT doc_id, CAST(SUM(micro) AS BIGINT) AS bm25_micro
      FROM contrib GROUP BY doc_id
    )
"""


@query(
    "ext_text_bm25",
    oracle=f"""
    WITH {_BM25_ORACLE_CTE}
    SELECT doc_id, bm25_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id)
                AS INT) AS rank
    FROM bm25
    QUALIFY rank <= {TOP_N}
    """,
)
def ext_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) document ranking for a fixed query-term
    set, top-10 — the standard lexical retrieval scorer (Robertson et
    al.'s probabilistic weighting, as implemented by every search
    engine), expressed as two bounded aggregates and broadcast joins.

    Scale shape: see ``_bm25_scored``. The final top-10 is a single
    unpartitioned row_number over a match-bounded relation; at 100 TB
    swap it for the TakeOrdered form (`sort_limit_topk`) — the scored
    relation is (matched docs)-sized either way.
    """
    bm25 = _bm25_scored(spark, sf_dir)
    w = Window.orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
    return (
        bm25.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_N)
        .select("doc_id", "bm25_micro", "rank")
    )


@query(
    "ext_sim_rrf",
    oracle=f"""
    WITH {_BM25_ORACLE_CTE},
    lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id)
                  AS INT) AS lex_rank
      FROM bm25 WHERE doc_id <> {QUERY_DOC}
    ),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings
          WHERE vec_id = {QUERY_DOC}),
    dense AS (
      SELECT e.vec_id AS doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY ROUND(list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), q.q_emb), 4) DESC,
               e.vec_id) AS INT) AS dense_rank
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> {QUERY_DOC}
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
             lex.lex_rank, dense.dense_rank,
             COALESCE(1000000000 // ({RRF_K} + lex.lex_rank), 0)
             + COALESCE(1000000000 // ({RRF_K} + dense.dense_rank), 0)
               AS rrf_nano
      FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
    )
    SELECT doc_id, lex_rank, dense_rank, rrf_nano,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf_nano DESC, doc_id)
                AS INT) AS rank
    FROM fused
    QUALIFY rank <= {TOP_N}
    """,
)
def ext_sim_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the BM25 lexical
    ranking and a dense cosine ranking (query vector = doc 7's
    embedding) fused as score = Σ 1/(60 + rank) — the standard
    hybrid-search combiner (Cormack et al.'s RRF), kept exact with
    integer nano-units: ``1e9 div (60 + rank)`` on both engines, so
    the fusion involves no float arithmetic at all.

    A doc missing from one ranking (no query term / no vector row)
    contributes only its other rank — the FULL OUTER + COALESCE(…, 0)
    shape. Both input rankings are global windows over bounded
    relations (match-bounded lexical side, corpus-sized dense side
    ranked per ``ext_sim_cosine_topk``'s broadcast pattern). The
    corpus-wide dense ranking makes this the VERIFICATION variant:
    ``ext_sim_rrf_ann`` is the production sibling (LSH candidates,
    every window partitioned by query) and this key is its exact
    auditor — the same pairing as ``ext_doc_shuffle`` /
    ``ext_doc_shuffle_sharded``.
    """
    lex = _bm25_scored(spark, sf_dir).filter(F.col("doc_id") != QUERY_DOC)
    lex = lex.withColumn(
        "lex_rank",
        F.row_number().over(Window.orderBy(F.desc("bm25_micro"), F.asc("doc_id"))),
    ).select("doc_id", "lex_rank")

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = corpus.filter(F.col("vec_id") == QUERY_DOC).select(
        F.col("emb").alias("q_emb")
    )
    dot = F.aggregate(
        F.zip_with("emb", "q_emb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731 — mirrors similarity._norm
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cosine = F.round(dot / (norm(F.col("emb")) * norm(F.col("q_emb"))), 4)
    dense = (
        corpus.filter(F.col("vec_id") != QUERY_DOC)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), cosine.alias("cosine"))
        .withColumn(
            "dense_rank",
            F.row_number().over(Window.orderBy(F.desc("cosine"), F.asc("doc_id"))),
        )
        .select("doc_id", "dense_rank")
    )

    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(
                F.expr(f"1000000000 div ({RRF_K} + lex_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000000 div ({RRF_K} + dense_rank)"), F.lit(0)
            )
        ).alias("rrf_nano"),
    )
    w = Window.orderBy(F.desc("rrf_nano"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_N)
    )


@query(
    "ext_rag_ingest",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                      len(string_split(text, ' ')) AS n FROM documents),
    chunks AS (
      SELECT doc_id, CAST(k AS INT) AS chunk_no,
             toks[k*24+1:k*24+32] AS ctoks
      FROM t, UNNEST(range(0, CAST(ceil(n / 24.0) AS BIGINT))) AS u(k)
      WHERE k * 24 < n
    ),
    tok_h AS (
      SELECT doc_id, chunk_no,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(tok, ''),
                 c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007) AS th
      FROM chunks, UNNEST(ctoks) AS u(tok)
    ),
    emb AS (
      SELECT doc_id, chunk_no,
             SUM((th * 3) % 2001 - 1000) AS e0,
             SUM((th * 5) % 2001 - 1000) AS e1,
             SUM((th * 7) % 2001 - 1000) AS e2,
             SUM((th * 9) % 2001 - 1000) AS e3,
             SUM((th * 11) % 2001 - 1000) AS e4,
             SUM((th * 13) % 2001 - 1000) AS e5
      FROM tok_h GROUP BY doc_id, chunk_no
    )
    SELECT doc_id, chunk_no,
           CAST(e0 AS BIGINT) AS e0, CAST(e1 AS BIGINT) AS e1,
           (CASE WHEN e0 > 0 THEN 1 ELSE 0 END)
         + (CASE WHEN e1 > 0 THEN 2 ELSE 0 END)
         + (CASE WHEN e2 > 0 THEN 4 ELSE 0 END)
         + (CASE WHEN e3 > 0 THEN 8 ELSE 0 END)
         + (CASE WHEN e4 > 0 THEN 16 ELSE 0 END)
         + (CASE WHEN e5 > 0 THEN 32 ELSE 0 END) AS bucket
    FROM emb
    """,
)
def ext_rag_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG ingest as ONE declarative plan: chunk every
    document (32-token windows, 24-token stride — the
    ``ext_doc_chunking`` convention), embed each chunk, and assign it
    a sign-LSH index bucket — the chunk/embed/index triple every
    retrieval pipeline runs at ingest time, here composed into a
    single lineage so Catalyst plans the whole path (no intermediate
    materialization between stages).

    The "embedding" is the engine's deterministic integer projection
    (per-token poly_hash pushed through 6 odd-multiplier arithmetic
    PRNG dims, summed per chunk — the ``ext_sim_ann_lsh`` sketch
    family), standing in for the external encoder model exactly like
    the multimodal keys' deterministic fake decode: the PLUMBING
    (chunk explode shape, per-chunk aggregation grain, bucket
    assignment, output schema) is the real thing under test, and it
    is integer-exact so the whole three-stage pipeline hash-checks
    against DuckDB. Swap the projection for a Pandas-UDF encoder
    call in production; every other stage is unchanged.

    Scale shape: chunk explode is linear (tokens/24 per doc); token
    hashes are computed ONCE per occurrence (materialized projection
    before the fold — the round-2 lambda-re-evaluation rule); the
    per-chunk aggregate map-side combines; bucket assignment is a
    pure projection. No shuffle except the chunk-grain aggregate.
    """
    from streamingdemo_spark.registry import poly_hash

    chunk, stride = 32, 24
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    with_toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    n = F.size("toks")
    ks = F.sequence(
        F.lit(0), F.greatest(F.ceil(n / stride).cast("int") - 1, F.lit(0))
    )
    start = F.col("chunk_no") * stride
    chunks = with_toks.select(
        "doc_id", "toks", F.explode(ks).alias("chunk_no")
    ).select(
        "doc_id", "chunk_no", F.slice("toks", start + 1, chunk).alias("ctoks")
    )
    tok_h = chunks.select(
        "doc_id", "chunk_no", F.explode("ctoks").alias("tok")
    ).select("doc_id", "chunk_no", poly_hash(F.col("tok")).alias("th"))
    mults = [3, 5, 7, 9, 11, 13]
    emb = tok_h.groupBy("doc_id", "chunk_no").agg(
        *[
            F.sum((F.col("th") * m) % 2001 - 1000).alias(f"e{k}")
            for k, m in enumerate(mults)
        ]
    )
    bucket = sum(
        F.when(F.col(f"e{k}") > 0, 2**k).otherwise(0) for k in range(6)
    )
    return emb.select(
        "doc_id", "chunk_no", "e0", "e1", bucket.alias("bucket")
    )


N_QT = 3  # rarest corpus terms drawn from each query document


def _rrf_ann_oracle() -> str:
    from streamingdemo_spark.extensions.similarity import ANN_LSH_CTE

    return f"""
    WITH {ANN_LSH_CTE},
    dtk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    d AS (SELECT doc_id, len(toks) AS dl FROM dtk),
    tot AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS dl_sum FROM d),
    toks AS (SELECT doc_id, unnest(toks) AS term FROM dtk),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
           GROUP BY doc_id, term),
    dfa AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    qt AS (
      SELECT q_id, term, df FROM (
        SELECT t.doc_id AS q_id, t.term, dfa.df,
               ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                  ORDER BY dfa.df ASC, t.term ASC) AS trk
        FROM (SELECT DISTINCT doc_id, term FROM tf WHERE doc_id < 8) t
        JOIN dfa ON dfa.term = t.term
        WHERE dfa.df >= 2)
      WHERE trk <= {N_QT}
    ),
    contrib AS (
      SELECT qt.q_id, tf.doc_id,
             CAST(FLOOR(
               ln(1 + (tot.n_docs - qt.df + 0.5) / (qt.df + 0.5))
               * ((tf.tf * {K1 + 1.0}) /
                  (tf.tf + {K1} * (({1.0 - B}) + {B} *
                   (CAST(d.dl * tot.n_docs AS DOUBLE) / tot.dl_sum))))
               * 1000000 + 0.5) AS BIGINT) AS micro
      FROM qt
      JOIN tf ON tf.term = qt.term AND tf.doc_id <> qt.q_id
      JOIN d ON d.doc_id = tf.doc_id
      CROSS JOIN tot
    ),
    lex AS (
      SELECT q_id, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY bm25_micro DESC, doc_id) AS INT) AS lex_rank
      FROM (SELECT q_id, doc_id, CAST(SUM(micro) AS BIGINT) AS bm25_micro
            FROM contrib GROUP BY q_id, doc_id)
    ),
    fused AS (
      SELECT COALESCE(l.q_id, dn.q_id) AS q_id,
             COALESCE(l.doc_id, dn.vec_id) AS doc_id,
             l.lex_rank, dn.rank AS dense_rank,
             COALESCE(1000000000 // ({RRF_K} + l.lex_rank), 0)
             + COALESCE(1000000000 // ({RRF_K} + dn.rank), 0) AS rrf_nano
      FROM lex l
      FULL OUTER JOIN (SELECT * FROM ann_ranked WHERE rank <= 5) dn
        ON l.q_id = dn.q_id AND l.doc_id = dn.vec_id
    )
    SELECT q_id, doc_id, lex_rank, dense_rank, rrf_nano,
           CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY rrf_nano DESC, doc_id) AS INT) AS rank
    FROM fused
    QUALIFY rank <= {TOP_N}
    """


@query("ext_sim_rrf_ann", oracle=_rrf_ann_oracle())
def ext_sim_rrf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION hybrid retrieval — the scale-path sibling of
    ``ext_sim_rrf``, which ranks the ENTIRE corpus per query on its
    dense leg (an exact global ordering: fine as an auditor, wrong as
    a plan at 100 TB). Here BOTH legs are candidate-bounded and every
    window is partitioned by query:

    - dense leg: the sign-LSH candidate generator of
      ``ext_sim_ann_lsh`` (bucket-join candidates, exact cosine
      re-rank WITHIN candidates only — per-query work is
      ~tables x corpus/2^planes, never the corpus);
    - lexical leg: per-query "more-like-this" BM25 — each query
      document contributes its 3 rarest corpus terms (df >= 2, ties
      by term), and only documents matching >= 1 of those terms are
      scored. Match-bounded by construction: rare terms have small
      postings lists.
    - fusion: one co-partitioned full-outer join on (q_id, doc_id),
      integer-exact RRF (1e9 div (60 + rank)), rank WITHIN the fused
      candidate set partitioned by q_id.

    ``ext_sim_rrf`` remains the exact-ranking auditor for this key
    (same fusion arithmetic over exhaustive rankings); the recall cost
    of candidate generation is measured by the ANN tests. No
    unpartitioned window exists on any leg — at 100 TB the plan is
    shuffle-bounded by candidate volume, not corpus size.

    Exactness: BM25 micro-units and integer RRF follow the module's
    float discipline (identical literal shapes both engines); the
    dense leg's LSH sketch is integer-exact (see
    ``similarity._bucket_udf``), so the DuckDB oracle replays the
    whole hybrid pipeline value-for-value.
    """
    from streamingdemo_spark.extensions.similarity import ext_sim_ann_lsh

    d = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    doclen = d.select("doc_id", F.size("toks").alias("dl"))
    tot = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("dl_sum")
    )
    toks = d.select("doc_id", F.explode("toks").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfa = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    w_t = Window.partitionBy("q_id").orderBy(F.asc("df"), F.asc("term"))
    qt = (
        tf.filter(F.col("doc_id") < 8)
        .select(F.col("doc_id").alias("q_id"), "term")
        .join(dfa.filter(F.col("df") >= 2), "term")
        .withColumn("trk", F.row_number().over(w_t))
        .filter(F.col("trk") <= N_QT)
        .select("q_id", "term", "df")
    )

    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfn = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf")
        + K1
        * (
            (1.0 - B)
            + B
            * ((F.col("dl") * F.col("n_docs")).cast("double") / F.col("dl_sum"))
        )
    )
    micro = F.floor(idf * tfn * 1000000 + F.lit(0.5)).alias("micro")
    lex = (
        tf.join(F.broadcast(qt), "term")
        .filter(F.col("doc_id") != F.col("q_id"))
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(tot))
        .select("q_id", "doc_id", micro)
        .groupBy("q_id", "doc_id")
        .agg(F.sum("micro").alias("bm25_micro"))
        .withColumn(
            "lex_rank",
            F.row_number()
            .over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("bm25_micro"), F.asc("doc_id")
                )
            )
            .cast("int"),
        )
        .select("q_id", "doc_id", "lex_rank")
    )

    dense = ext_sim_ann_lsh(spark, sf_dir).select(
        "q_id", F.col("vec_id").alias("doc_id"), F.col("rank").alias("dense_rank")
    )

    fused = (
        lex.join(dense, ["q_id", "doc_id"], "full_outer")
        .select(
            "q_id",
            "doc_id",
            "lex_rank",
            "dense_rank",
            (
                F.coalesce(
                    F.expr(f"1000000000 div ({RRF_K} + lex_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000000 div ({RRF_K} + dense_rank)"),
                    F.lit(0),
                )
            ).alias("rrf_nano"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("rrf_nano"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_N)
    )
MMR_CAND = 10  # relevance candidates per query entering the greedy loop
MMR_K = 5      # diversified picks per query
# lambda = 0.7 as the exact integer pair (7, 3): score = 7*rel - 3*redund
_MMR_LAM = (7, 3)


def _mmr_oracle() -> str:
    """Unrolled greedy-MMR oracle: CTE chain s1..s{MMR_K}, each step an
    integer argmax (the ext_graph_pagerank unrolling discipline)."""
    lam, mu = _MMR_LAM
    parts = [f"""
    q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
          FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.q_id, e.vec_id AS c_id,
             CAST(FLOOR(list_cosine_similarity(
               CAST(e.embedding AS DOUBLE[]), q.q_emb) * 10000 + 0.5)
               AS BIGINT) AS rel_u
      FROM embeddings e, q WHERE e.vec_id <> q.q_id
    ),
    cand AS (
      SELECT q_id, c_id, rel_u FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY rel_u DESC, c_id) AS rn FROM scored)
      WHERE rn <= {MMR_CAND}
    ),
    ps AS (
      SELECT a.q_id, a.c_id AS ca, b.c_id AS cb,
             CAST(FLOOR(list_cosine_similarity(
               CAST(ea.embedding AS DOUBLE[]),
               CAST(eb.embedding AS DOUBLE[])) * 10000 + 0.5)
               AS BIGINT) AS sim_u
      FROM cand a
      JOIN cand b ON b.q_id = a.q_id AND b.c_id <> a.c_id
      JOIN embeddings ea ON ea.vec_id = a.c_id
      JOIN embeddings eb ON eb.vec_id = b.c_id
    ),
    s1 AS (
      SELECT q_id, c_id, rel_u, 1 AS mmr_rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY rel_u DESC, c_id) AS rn FROM cand)
      WHERE rn = 1
    )"""]
    prev_sel = "s1"
    for k in range(2, MMR_K + 1):
        parts.append(f"""
    r{k} AS (
      SELECT c.q_id, c.c_id, c.rel_u,
             MAX(ps.sim_u) AS mx
      FROM cand c
      JOIN {prev_sel} s ON s.q_id = c.q_id
      JOIN ps ON ps.q_id = c.q_id AND ps.ca = c.c_id AND ps.cb = s.c_id
      WHERE c.c_id NOT IN (SELECT c_id FROM {prev_sel} x
                           WHERE x.q_id = c.q_id)
      GROUP BY c.q_id, c.c_id, c.rel_u
    ),
    p{k} AS (
      SELECT q_id, c_id, rel_u, {k} AS mmr_rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY {lam} * rel_u - {mu} * mx DESC, c_id) AS rn
        FROM r{k})
      WHERE rn = 1
    ),
    s{k} AS (SELECT * FROM {prev_sel} UNION ALL SELECT * FROM p{k})""")
        prev_sel = f"s{k}"
    return (
        "WITH" + ",".join(parts)
        + f"""
    SELECT q_id, c_id AS doc_id, rel_u, CAST(mmr_rank AS INT) AS mmr_rank
    FROM {prev_sel}
    """
    )


@query("ext_sim_mmr", oracle=_mmr_oracle())
def ext_sim_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval via Maximal Marginal Relevance (Carbonell
    & Goldstein '98): from each query's top-{MMR_CAND} relevance
    candidates, greedily pick {MMR_K} results maximizing
    ``0.7*relevance - 0.3*max-similarity-to-already-picked`` — the
    re-ranking step that stops a result page (or a RAG context window)
    from being five near-duplicates of the best hit.

    The greedy loop is SEQUENTIAL by definition, which usually exiles
    such operators to rows-only status. Here it is fully
    oracle-checked: every score is integer deci-milli units
    (``floor(cosine*1e4 + 0.5)`` — exact, since the raw cosines are
    bitwise-equal across engines per this module's float discipline),
    and each step's argmax ties break on id — so DuckDB replays the
    greedy selection decision-for-decision through its unrolled
    {MMR_K}-step CTE chain.

    Scale shape: the expensive part is the INITIAL top-{MMR_CAND}
    retrieval, which is exactly ``ext_sim_cosine_topk``'s broadcast
    scan (swap in the ANN keys at 100 TB; the MMR stage never sees
    the corpus). The greedy stage is ONE grouped Arrow stage
    (``applyInPandas`` per query): each group is {MMR_CAND} rows, the
    pairwise cosines and the K-step argmax loop run in-process on
    int64/float64 numpy — r14-opt; the prior dataflow form unrolled
    the K steps as Spark jobs (plan grew 3^K until checkpointed, and
    even checkpointed it paid K sequential driver-blocking jobs of
    ~0.6 s fixed cost each for 8-row results: 3.3 s where this form
    measures ~1 s). Exactness is preserved because the in-UDF math
    replays Spark's expression semantics operation-for-operation:
    embeddings are already double (cast before any math in
    ``_corpus_and_queries``), ``_dot``/``_norm`` are seed-0.0 LEFT
    FOLDS — reproduced by accumulating dim-by-dim across the group
    matrix (``acc += outer(E[:,k], E[:,k])``), bit-identical since
    float64 add/mul/div/sqrt are IEEE-exact given identical operand
    order — and the quantization/argmax arithmetic is integer.
    Per-query work is O(K·CAND + CAND²·d), independent of corpus
    size; the only shuffle after retrieval is the groupBy(q_id).
    """
    from streamingdemo_spark.extensions.similarity import (
        _corpus_and_queries,
        _dot,
        _norm,
    )

    lam, mu = _MMR_LAM
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    rel_u = F.floor(
        _dot("embedding", "q_emb") / (_norm("embedding") * _norm("q_emb"))
        * 10000
        + F.lit(0.5)
    ).cast("long")
    w_rel = Window.partitionBy("q_id").orderBy(F.desc("rel_u"), F.asc("c_id"))
    cand = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            rel_u.alias("rel_u"),
            "embedding",
        )
        .withColumn("rn", F.row_number().over(w_rel))
        .filter(F.col("rn") <= MMR_CAND)
        .drop("rn")
    )

    def mmr_greedy(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["c_id"].to_numpy()
        rel = pdf["rel_u"].to_numpy()
        E = np.vstack(pdf["embedding"].to_numpy())  # (n, d) float64
        n, dims = E.shape
        # Spark-exact pairwise sim_u: _dot/_norm are 0.0-seeded left
        # folds, so accumulate dim-by-dim (same add order per pair);
        # products/divisions/sqrt then match IEEE-exactly.
        dot = np.zeros((n, n))
        nsq = np.zeros(n)
        for k in range(dims):
            col = E[:, k]
            dot += np.multiply.outer(col, col)
            nsq += col * col
        norm = np.sqrt(nsq)
        # precondition (same as the oracle's list_cosine_similarity and
        # the previous dataflow form): candidate norms are nonzero —
        # the embeddings fixture generates non-degenerate vectors, and
        # a zero vector has no defined cosine in either engine
        sim = dot / np.multiply.outer(norm, norm)
        sim_u = np.floor(sim * 10000 + 0.5).astype(np.int64)
        q = int(pdf["q_id"].iloc[0])
        avail = np.ones(n, dtype=bool)
        out_c, out_r, out_k = [], [], []
        picked: list = []
        for step in range(1, MMR_K + 1):
            if not avail.any():
                break
            ai = np.flatnonzero(avail)
            if step == 1:
                score = rel[ai]
            else:
                mx = sim_u[np.ix_(ai, picked)].max(axis=1)
                score = lam * rel[ai] - mu * mx
            # argmax with id tiebreak == ORDER BY score DESC, c_id ASC
            j = ai[np.lexsort((ids[ai], -score))[0]]
            picked.append(j)
            avail[j] = False
            out_c.append(ids[j])
            out_r.append(rel[j])
            out_k.append(step)
        return pd.DataFrame(
            {
                "q_id": np.full(len(out_c), q, dtype=np.int64),
                "c_id": np.asarray(out_c, dtype=np.int64),
                "rel_u": np.asarray(out_r, dtype=np.int64),
                "mmr_rank": np.asarray(out_k, dtype=np.int32),
            }
        )

    sel = cand.groupBy("q_id").applyInPandas(
        mmr_greedy, "q_id long, c_id long, rel_u long, mmr_rank int"
    )
    return sel.select(
        "q_id", F.col("c_id").alias("doc_id"), "rel_u", "mmr_rank"
    )


# ---------------------------------------------------------------------------
# Retrieval-quality metrics: the offline eval harness for the ANN keys.

EVAL_K = 10  # judge the top-10 of the run against top-10 exact relevance

# Per-position DCG gains on the integer micro-unit grid:
# gain[i] = floor(1e6 / log2(i + 1) + 0.5), i = 1..10 — precomputed as
# LITERALS so neither engine evaluates log2 at query time (a libm
# transcendental whose last ulp is engine-specific); both engines index
# the same constant table, making DCG an exact int64 sum.
_DCG_GAINS = (
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
)
_IDCG_MICRO = sum(_DCG_GAINS)  # all EVAL_K judged docs relevant
_GAINS_SQL = "[" + ", ".join(str(g) for g in _DCG_GAINS) + "]"


def _retrieval_metrics_oracle() -> str:
    from streamingdemo_spark.extensions.similarity import ANN_LSH_CTE

    return f"""
    WITH {ANN_LSH_CTE},
    exact10 AS (
      SELECT q_id, vec_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY ROUND(list_cosine_similarity(c.emb, q.emb), 4)
                          DESC, c.vec_id ASC) AS rnk
        FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 8)
      WHERE rnk <= {EVAL_K}
    ),
    run10 AS (
      SELECT q_id, vec_id, rank FROM ann_ranked WHERE rank <= {EVAL_K}
    ),
    hitjoin AS (
      SELECT r.q_id, r.rank, (e.vec_id IS NOT NULL) AS hit
      FROM run10 r LEFT JOIN exact10 e
        ON r.q_id = e.q_id AND r.vec_id = e.vec_id
    ),
    perq AS (
      SELECT q_id,
             CAST(COUNT(*) AS BIGINT) AS n_ret,
             CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hits,
             MIN(CASE WHEN hit THEN rank END) AS fr,
             CAST(SUM(CASE WHEN hit THEN {_GAINS_SQL}[rank]
                           ELSE 0 END) AS BIGINT) AS dcg_micro
      FROM hitjoin GROUP BY q_id
    )
    SELECT q_id, n_ret, hits,
           ROUND(hits / 10.0, 4) AS recall_at10,
           COALESCE(CAST(1000000 AS BIGINT) // fr,
                    CAST(0 AS BIGINT)) AS mrr_micro,
           dcg_micro,
           ROUND(CAST(dcg_micro AS DOUBLE) / {_IDCG_MICRO}, 6) AS ndcg
    FROM perq
    """


@query("ext_retrieval_metrics", oracle=_retrieval_metrics_oracle())
def ext_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline retrieval-quality evaluation (the TREC-style harness a
    production ANN index ships with): run the LSH index
    (``similarity.ann_lsh_ranked``) for the standing query set, judge
    its top-10 against exact-cosine top-10 as binary relevance, and
    report per-query recall@10, MRR and nDCG@10 — the numbers that
    decide whether an index rebuild / parameter change may ship.

    Exactness: MRR is ``1e6 DIV first_hit_rank`` (pure integer); DCG
    uses a precomputed integer gain table (``_DCG_GAINS`` — no runtime
    log2), so both are exact int64 sums; recall and nDCG each close
    with ONE double division replayed identically by the oracle. The
    whole pipeline (sketch, buckets, re-rank, judgments, metrics) is
    deterministic, so the "approximate" index's quality report is
    itself hash-certified.

    Scale shape: both legs are one-corpus-scan pipelines (broadcast
    query side); the metric join touches |Q| x k rows — nothing after
    candidate generation grows with the corpus. At 100 TB the exact
    leg runs on a fixed stratified sample of queries (judgments are
    |Q| x k, never corpus-sized) — the standard offline-eval shape.

    Reference parity: north-star extension beyond the reference's SQL
    entry (src/sparkSQL/SparkSQLOperator.java:17-23), per SURVEY §2.F.
    """
    from streamingdemo_spark.extensions.similarity import (
        ann_lsh_ranked,
        exact_cosine_ranked,
    )

    run = ann_lsh_ranked(spark, sf_dir).filter(F.col("rank") <= EVAL_K)
    rel = (
        exact_cosine_ranked(spark, sf_dir)
        .filter(F.col("rank") <= EVAL_K)
        .select("q_id", "vec_id", F.lit(1).alias("rel"))
    )
    hit = F.col("rel").isNotNull()
    gains = F.array(*[F.lit(g) for g in _DCG_GAINS])
    perq = (
        run.join(F.broadcast(rel), ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_ret"),
            F.sum(F.when(hit, 1).otherwise(0)).alias("hits"),
            F.min(F.when(hit, F.col("rank"))).alias("fr"),
            F.sum(
                F.when(hit, F.element_at(gains, F.col("rank"))).otherwise(0)
            ).alias("dcg_micro"),
        )
    )
    return perq.select(
        "q_id",
        "n_ret",
        "hits",
        F.round(F.col("hits") / 10.0, 4).alias("recall_at10"),
        F.coalesce(F.expr("1000000 DIV fr"), F.lit(0).cast("long")).alias(
            "mrr_micro"
        ),
        "dcg_micro",
        F.round(F.col("dcg_micro").cast("double") / _IDCG_MICRO, 6).alias(
            "ndcg"
        ),
    )
