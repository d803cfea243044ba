"""Table-backed operator registry (SURVEY §2.A6).

The reference loads operator ``name → mainClass`` rows from a MySQL
table and resolves classes reflectively (``DBHelper.java:8-35``,
``OpContainerTest.java:124-145``). Its query builds SQL by string
concatenation — an injection footgun the survey flags — so this
implementation keeps the *capability* (a database table as the source
of truth for which operators exist) with two safety changes:

1. The table is read through Spark's JDBC source with parameterized
   reader options (``url`` / ``dbtable`` / ``driver``), never
   concatenated SQL.
2. The loaded ``main_class`` dotted paths resolve through
   ``OperatorRegistry.resolve`` at dispatch time, so the module-prefix
   allowlist still gates what a table row can import — a writable
   registry table must not become arbitrary code execution.

Works against any JDBC database Spark has a driver for; the test suite
uses the Derby embedded driver that ships in Spark's classpath (no
external server in this environment — the reader call is identical
for MySQL/Postgres, only the url/driver options change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streamingdemo_spark.operators.registry import OperatorFn, OperatorRegistry

REGISTRY_SCHEMA = "op_name string, main_class string"


def registry_table_from_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """Read an operator-registry table over JDBC (``DBHelper.java:19-27``
    shape: one row per operator, name + implementation reference).

    All inputs are passed as reader options — the JDBC source quotes
    ``dbtable`` as an identifier; nothing is string-concatenated into a
    query.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def register_from_table(
    registry: OperatorRegistry,
    table_df: DataFrame,
    name_col: str = "op_name",
    class_col: str = "main_class",
) -> list[str]:
    """Register every (name, dotted-path) row of a registry table.

    The registry table is metadata — a handful of rows — so collecting
    it to the driver is the correct plan (mirrors the reference caching
    DB rows in a map, ``DBHelper.java:28-33``). Resolution is deferred
    to dispatch and goes through ``registry.resolve``, so the plugin
    allowlist applies to table-sourced paths exactly as to spec-sourced
    ones.
    """
    rows = table_df.select(name_col, class_col).collect()
    names: list[str] = []
    for row in rows:
        op_name, dotted = row[name_col], row[class_col]

        def _deferred(dotted: str = dotted) -> OperatorFn:
            def op(spark, params, inputs):
                return registry.resolve(dotted)(spark, params, inputs)

            return op

        registry.register(op_name)(_deferred())
        names.append(op_name)
    return names
