"""Container execution (SURVEY §2.A4, A7-A9).

The reference walks the topo order, reflectively invokes each
operator, merges returned ports into a global ``RESULT_MAP``, and
fail-fast breaks on the first error (``OpContainer.java:92-150``),
accumulating an XML run log (``:71-90,152-179``). Here: same walk,
but errors raise (no silent partial execution) and the run log is
structured JSON lines.

Execution is lazy end-to-end — operators only compose lineage; actions
happen when a sink operator writes or the caller collects. That hands
the *whole pipeline* to Catalyst as one logical plan (SURVEY §4): the
engine's planning upgrade over the reference's per-operator black
boxes.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from streamingdemo_spark.operators.graph import PipelineGraph
from streamingdemo_spark.operators.registry import DEFAULT_REGISTRY, OperatorRegistry


@dataclass
class RunLog:
    """Structured analogue of the reference's startLog XML
    (``OpContainer.java:71-90``)."""

    job_id: str
    entries: list[dict] = field(default_factory=list)

    def record(self, op_name: str, status: str, elapsed_ms: float, error: str = "") -> None:
        self.entries.append(
            {
                "job_id": self.job_id,
                "operator": op_name,
                "status": status,
                "elapsed_ms": round(elapsed_ms, 3),
                "error": error,
            }
        )

    def to_json_lines(self) -> str:
        return "\n".join(json.dumps(e) for e in self.entries)

    def write(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write(self.to_json_lines() + "\n")


class OperatorError(RuntimeError):
    """An operator failed; carries the run log accumulated so far."""

    def __init__(self, op_name: str, cause: Exception, log: RunLog):
        super().__init__(f"operator {op_name!r} failed: {cause}")
        self.op_name = op_name
        self.cause = cause
        self.log = log


def run_pipeline(
    spark: SparkSession,
    spec: dict,
    registry: OperatorRegistry | None = None,
    job_id: str = "job",
    log_path: str | None = None,
) -> dict[str, DataFrame]:
    """Compile + execute a pipeline spec; returns the global port map
    keyed ``"<opName>.<port>"`` (the reference's RESULT_MAP,
    ``OpContainer.java:43,131-136``)."""
    registry = registry or DEFAULT_REGISTRY
    graph = PipelineGraph(spec)
    ports: dict[str, DataFrame] = {}
    log = RunLog(job_id)
    try:
        for op_name in graph.order:
            node = graph.nodes[op_name]
            try:
                fn = registry.resolve(node.op)
            except Exception as exc:
                log.record(op_name, "failed", 0.0, str(exc))
                raise OperatorError(op_name, exc, log) from exc
            # Bind input ports from the global registry
            # (``OpContainer.java:100-105``).
            inputs = {}
            for port, addr in node.inputs.items():
                if addr not in ports:
                    raise KeyError(
                        f"{op_name}: upstream port {addr!r} was never produced "
                        f"(available: {sorted(ports)})"
                    )
                inputs[port] = ports[addr]
            t0 = time.perf_counter()
            try:
                outputs = fn(spark, node.params, inputs) or {}
            except Exception as exc:
                log.record(op_name, "failed", (time.perf_counter() - t0) * 1e3, str(exc))
                raise OperatorError(op_name, exc, log) from exc
            log.record(op_name, "success", (time.perf_counter() - t0) * 1e3)
            for port, df in outputs.items():
                ports[f"{op_name}.{port}"] = df
    finally:
        if log_path:
            log.write(log_path)
    return ports
