"""Operator container (SURVEY.md §2.A) — the reference's dataflow layer
(``src/iie/SparkStreaming/OpContainer.java``) re-expressed in Python.

A pipeline spec (plain dict, A1) compiles to a DAG (A2), is
topologically ordered (A3), and each operator is dispatched from a
registry (A4-A6) with per-operator params and named input ports (A7);
execution is lazy — operators only compose DataFrame lineage, so
Catalyst optimizes across operator boundaries, which the reference's
reflective black boxes could not (SURVEY.md §4).
"""

from streamingdemo_spark.operators.container import run_pipeline
from streamingdemo_spark.operators.graph import PipelineGraph, CycleError, SpecError
from streamingdemo_spark.operators.registry import OperatorRegistry, DEFAULT_REGISTRY
import streamingdemo_spark.operators.builtin  # noqa: F401  (registers built-ins)

__all__ = [
    "run_pipeline",
    "PipelineGraph",
    "CycleError",
    "SpecError",
    "OperatorRegistry",
    "DEFAULT_REGISTRY",
]
