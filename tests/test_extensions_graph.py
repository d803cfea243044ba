"""Property tests for the graph extension (oracle tests pin exact
values; these pin the invariants that survive fixture changes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamingdemo_spark.registry import QUERIES


def test_pagerank_conserves_mass_and_ranks_hubs(spark, sf_dir):
    df = QUERIES["ext_graph_pagerank"](spark, sf_dir).cache()
    row = df.agg(
        F.sum("rank_nano").alias("mass"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    # Integer floors only ever DROP mass (≤1 nano-unit per directed
    # edge per iteration + 2 per node): total stays at most a hair
    # under the ideal 1e9, never above it.
    assert row["mass"] <= 1_000_000_000
    assert row["mass"] >= 999_000_000
    # Suppliers are ~15x rarer than customers in the co-purchase
    # bipartite graph, so they concentrate rank: the top node by rank
    # must be a supplier hub, and every rank is positive.
    top = df.orderBy(F.desc("rank_nano")).limit(1).collect()[0]
    assert top["node_type"] == "supplier"
    assert df.filter(F.col("rank_nano") <= 0).count() == 0
