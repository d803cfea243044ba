"""streamingdemo_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of BYRans/StreamingDemo
(reference surveyed in SURVEY.md) on the Spark DataFrame / SQL /
Structured Streaming stack:

- the reference's operator-container dataflow (XML DAG -> toposort ->
  reflective dispatch, ``OpContainer.java``) becomes a Python pipeline
  spec compiled to DataFrame lineage (``operators/``);
- its schema-tagged streams (``DStreamWithSchema``) become streaming
  DataFrames (``streaming/``);
- its unrestricted SQL entry point (``SparkSQLOperator.java:18-19``)
  becomes the declared relational operator surface (``plans/``);
- plus LLM-data-pipeline extensions: dedup, similarity search, text
  analysis, multimodal columns (``extensions/``).

Everything is declarative DataFrame/SQL so Catalyst plans the physical
execution (pushdown, broadcast/AQE join selection, codegen); Python
UDFs appear only where builtins cannot express the semantics, and then
always Arrow-vectorized.
"""

from streamingdemo_spark.session import get_spark
from streamingdemo_spark.io import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
