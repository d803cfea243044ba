"""Property-based tests for the container DAG layer (pure Python, no
Spark): for any randomly generated acyclic spec, the topological order
must schedule every operator after all of its inputs; for any spec
with an injected back-edge, construction must raise."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from streamingdemo_spark.operators.graph import CycleError, PipelineGraph, SpecError


@st.composite
def acyclic_specs(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    names = [f"op{i}" for i in range(n)]
    ops = []
    for i, name in enumerate(names):
        inputs = {}
        if i:
            n_in = draw(st.integers(min_value=0, max_value=min(3, i)))
            ups = draw(
                st.lists(
                    st.sampled_from(names[:i]),
                    min_size=n_in,
                    max_size=n_in,
                    unique=True,
                )
            )
            inputs = {f"in{j}": f"{u}.out" for j, u in enumerate(ups)}
        ops.append({"name": name, "op": "x", "inputs": inputs})
    return {"operators": ops}


@given(acyclic_specs())
@settings(max_examples=200, deadline=None)
def test_topo_order_respects_dependencies(spec):
    g = PipelineGraph(spec)
    pos = {name: i for i, name in enumerate(g.order)}
    assert sorted(pos) == sorted(g.nodes)
    for node in g.nodes.values():
        for up in node.upstream_ops:
            assert pos[up] < pos[node.name], (
                f"{up} scheduled after its consumer {node.name}"
            )


@given(acyclic_specs(), st.data())
@settings(max_examples=100, deadline=None)
def test_injected_back_edge_raises(spec, data):
    ops = spec["operators"]
    g = PipelineGraph(spec)
    # Inject an edge from a later node back into an earlier one, closing
    # a cycle through the (already linearized) order when a path exists.
    with_inputs = [o for o in ops if o["inputs"]]
    if not with_inputs:
        return
    later = data.draw(st.sampled_from(with_inputs))
    # pick an ancestor of `later` and make it depend on `later` -> cycle
    def ancestors(name, acc):
        for up in g.nodes[name].upstream_ops:
            if up not in acc:
                acc.add(up)
                ancestors(up, acc)
        return acc

    anc = ancestors(later["name"], set())
    if not anc:
        return
    target = data.draw(st.sampled_from(sorted(anc)))
    for o in ops:
        if o["name"] == target:
            o["inputs"] = dict(o.get("inputs", {}))
            o["inputs"]["back"] = f"{later['name']}.out"
    try:
        PipelineGraph(spec)
        raised = False
    except (CycleError, SpecError):
        raised = True
    assert raised, f"cycle {later['name']} -> {target} not detected"
