"""Declared relational operator surface (SURVEY.md §2 layer C/D).

The reference exposes its whole relational capability through one
unrestricted SQL string (``src/sparkSQL/SparkSQLOperator.java:18-19``);
these modules enumerate that surface as concrete, tested operator keys.
Importing this package populates ``streamingdemo_spark.registry``.
"""

from streamingdemo_spark.plans import (  # noqa: F401
    flagship,
    flagship_sweep,
    scans,
    lakehouse,
    projections,
    joins,
    aggregations,
    windows,
    sorts_sets,
    scalar_functions,
    storage,
    subqueries,
    udfs,
    behavior,
)
