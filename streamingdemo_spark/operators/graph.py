"""Pipeline spec → validated DAG → topological order (SURVEY §2.A1-A3).

The reference parses a procedure-definition XML into
``HashMap<String, OpNode>`` with indegree/children/input-port fields
(``OpContainer.java:288-331,474-543``) and runs Kahn's algorithm
(``OpContainer.java:197-223``). Here the spec is a plain dict (XML was
an accident of the reference, not a capability) and cycles raise
instead of silently executing the acyclic prefix
(``OpContainer.java:207-210`` — behavior explicitly not replicated,
SURVEY appendix).

Spec shape::

    {
      "operators": [
        {"name": "src", "op": "parquet_source",
         "params": {"path": "..."}},
        {"name": "proj", "op": "add_field",
         "params": {"name": "net", "expr": "a * b"},
         "inputs": {"in": "src.out"}},
      ]
    }

Port addresses are ``"<operatorName>.<portName>"`` strings, exactly the
reference's named-dataset convention (``AddField.java:19``,
``OpContainer.java:101-105``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import CycleError as _GraphlibCycleError
from graphlib import TopologicalSorter


class SpecError(ValueError):
    """Invalid pipeline spec (unknown refs, duplicate names, bad shape)."""


class CycleError(SpecError):
    """The operator graph contains a cycle."""


@dataclass
class OpNode:
    """One operator node — the engine's analogue of the reference's
    ``OpNode`` IR (``OpContainer.java:474-543``)."""

    name: str
    op: str
    params: dict = field(default_factory=dict)
    # input port name -> upstream "op.port" address
    inputs: dict[str, str] = field(default_factory=dict)

    @property
    def upstream_ops(self) -> set[str]:
        return {addr.split(".", 1)[0] for addr in self.inputs.values()}


class PipelineGraph:
    """Validated operator DAG with a deterministic topological order."""

    def __init__(self, spec: dict):
        ops = spec.get("operators")
        if not isinstance(ops, list) or not ops:
            raise SpecError("spec must contain a non-empty 'operators' list")
        self.nodes: dict[str, OpNode] = {}
        for entry in ops:
            try:
                node = OpNode(
                    name=entry["name"],
                    op=entry["op"],
                    params=dict(entry.get("params", {})),
                    inputs=dict(entry.get("inputs", {})),
                )
            except (KeyError, TypeError) as exc:
                raise SpecError(f"malformed operator entry {entry!r}: {exc}") from exc
            if node.name in self.nodes:
                raise SpecError(f"duplicate operator name: {node.name!r}")
            self.nodes[node.name] = node
        self._validate_edges()
        self.order = self._toposort()

    def _validate_edges(self) -> None:
        for node in self.nodes.values():
            for port, addr in node.inputs.items():
                if "." not in addr:
                    raise SpecError(
                        f"{node.name}.{port}: port address {addr!r} is not "
                        "'<operator>.<port>'"
                    )
                up = addr.split(".", 1)[0]
                if up not in self.nodes:
                    raise SpecError(
                        f"{node.name}.{port}: unknown upstream operator {up!r}"
                    )
                if up == node.name:
                    raise CycleError(f"{node.name}: self-loop on port {port!r}")

    def _toposort(self) -> list[str]:
        ts: TopologicalSorter[str] = TopologicalSorter()
        # Insert in spec order so ties break deterministically.
        for name, node in self.nodes.items():
            ts.add(name, *sorted(node.upstream_ops))
        try:
            return list(ts.static_order())
        except _GraphlibCycleError as exc:
            raise CycleError(f"operator graph has a cycle: {exc.args}") from exc
