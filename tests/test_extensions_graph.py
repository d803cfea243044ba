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
    # Integer floors only ever DROP mass: per iteration at most 1
    # nano-unit per directed edge (contribution floor) + 2 per node
    # (base + damp floors), plus the initial split's n units — so the
    # bound is derived from the graph's actual size, not a constant
    # (a constant slack fails spuriously on larger fixtures).
    from streamingdemo_spark.io import load_tables

    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    n_pairs = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select((F.col("o_custkey") * 2), (F.col("l_suppkey") * 2 + 1))
        .distinct()
        .count()
    )
    n_edges = 2 * n_pairs
    max_loss = 3 * (n_edges + 2 * row["n"]) + row["n"]
    assert row["mass"] <= 1_000_000_000
    assert row["mass"] >= 1_000_000_000 - max_loss
    # Suppliers are ~15x rarer than customers in the co-purchase
    # bipartite graph, so they concentrate rank: the top node by rank
    # must be a supplier hub, and every rank is positive.
    top = df.orderBy(F.desc("rank_nano")).limit(1).collect()[0]
    assert top["node_type"] == "supplier"
    assert df.filter(F.col("rank_nano") <= 0).count() == 0


def test_label_prop_forms_real_communities(spark, sf_dir):
    """Propagation must actually coarsen: strictly fewer communities
    than nodes, every community label is itself a graph node, every
    node appears exactly once, and n_members is consistent with the
    community assignment."""
    df = QUERIES["ext_graph_label_prop"](spark, sf_dir)
    rows = df.collect()
    nodes = {r["supplier"] for r in rows}
    comms = {r["community"] for r in rows}
    assert len(rows) == len(nodes)  # one row per node
    assert comms <= nodes  # labels are node ids
    assert len(comms) < len(nodes)  # merging happened
    import collections

    size = collections.Counter(r["community"] for r in rows)
    assert all(r["n_members"] == size[r["community"]] for r in rows)


def test_link_predict_returns_true_nonedges_with_shared_structure(
    spark, sf_dir
):
    """Every predicted link must be a genuine NON-edge of the backbone
    whose endpoints really share the claimed number of neighbors, and
    the Jaccard ordering must be consistent with the integer score."""
    from streamingdemo_spark.extensions.graph import _backbone

    preds = QUERIES["ext_graph_link_predict"](spark, sf_dir).collect()
    assert preds
    edges = {
        (r["ea"], r["eb"]) for r in _backbone(spark, sf_dir).collect()
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for r in preds:
        a, b = r["supplier_a"], r["supplier_b"]
        assert (a, b) not in edges and (b, a) not in edges
        cn = len(adj[a] & adj[b])
        assert cn == r["common_nbrs"]
        expect = cn * 1000000 // (len(adj[a]) + len(adj[b]) - cn)
        assert expect == r["jac_micro"]
    scores = [r["jac_micro"] for r in sorted(preds, key=lambda r: r["rk"])]
    assert scores == sorted(scores, reverse=True)
