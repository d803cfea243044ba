"""Order-insensitive result comparison between Spark and DuckDB.

Stricter than the driver's value-hash: values must be exactly equal
(after type normalization), so if this passes, any reasonable hashing
scheme over the same results also matches. Columns are compared sorted
by name, mirroring the driver.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import pandas as pd

from pyspark.sql import DataFrame


def _norm(v):
    """Normalize engine-specific scalar types to plain Python values."""
    if v is None or v is pd.NaT:
        return None
    if type(v).__module__ == "numpy":
        if getattr(v, "ndim", 0):  # ndarray from an array column
            return tuple(_norm(x) for x in v)
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _sort_key(row):
    def key1(v):
        if v is None:
            return (0, "")
        if isinstance(v, bool):
            return (1, float(v))
        if isinstance(v, (int, float, Decimal)):
            return (1, float(v))
        if isinstance(v, str):
            return (2, v)
        if isinstance(v, _dt.datetime):
            return (3, v.isoformat())
        if isinstance(v, _dt.date):
            return (3, v.isoformat())
        if isinstance(v, tuple):
            return (4, tuple(key1(x) for x in v))
        return (5, repr(v))

    return tuple(key1(v) for v in row)


def spark_rows(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    pdf = df.toPandas()[cols]  # Arrow-accelerated driver transfer
    rows = [tuple(_norm(v) for v in row) for row in pdf.itertuples(index=False)]
    return cols, sorted(rows, key=_sort_key)


def duck_rows(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = [tuple(_norm(r[i]) for i in order) for r in cur.fetchall()]
    return [names[i] for i in order], sorted(rows, key=_sort_key)


def assert_scalar_schema(df: DataFrame, key: str = "?") -> None:
    """Every registered query must output only scalar-typed columns:
    the driver canonicalizes results through pandas ``sort_values`` /
    hashing, which raises ``unhashable type: 'list'`` on array/map
    cells (CORRECTNESS_r01: agg_percentile, agg_collect_sorted).

    DECIMAL outputs are banned too: Spark hands pandas ``Decimal``
    objects that stringify with trailing zeros ('149041.30') while
    DuckDB hands float64 ('149041.3') — value-equal, hash-different
    (fn_cast at sf0.01). Cast money outputs to double (the repo's
    dsum/osum convention keeps them bitwise-equal)."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType, DecimalType))
    ]
    assert not bad, f"{key}: non-hash-safe output columns {bad}"


def assert_matches_oracle(df: DataFrame, con, sql: str, key: str = "?") -> None:
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows = duck_rows(con, sql)
    assert s_cols == d_cols, f"{key}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{key}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        assert sr == dr, f"{key}: row {i} differs:\n  spark={sr}\n  duck ={dr}"
