"""Oracle-differential tests: every oracle=Y key vs DuckDB (SURVEY §5.1),
plus rows-only smoke for keys without an oracle."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from streamingdemo_spark.registry import ORACLE_BUILDERS, ORACLES, QUERIES

from tests.oracle_compare import assert_matches_oracle, assert_scalar_schema

ORACLE_KEYS = sorted(set(ORACLES) | set(ORACLE_BUILDERS))
ROWS_ONLY_KEYS = sorted(set(QUERIES) - set(ORACLE_KEYS))


def _oracle_for(key: str, sf_dir: str) -> str:
    """Static oracle text, or the data-derived builder resolved at the
    suite's sf_dir — the builders embed corpus-derived constants, so
    the text must match the tier the comparison runs at."""
    sql = ORACLES.get(key)
    return sql if sql is not None else ORACLE_BUILDERS[key](sf_dir)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_matches_oracle(key, spark, duck, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    assert_scalar_schema(df, key)
    assert_matches_oracle(df, duck, _oracle_for(key, sf_dir), key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_smoke(key, spark, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    assert_scalar_schema(df, key)
    assert df.count() >= 0


def test_no_hugeint_oracle_columns(duck):
    """Registration-time oracle-typing gate (round-6 judge finding):
    DuckDB widens SUM over integer columns to HUGEINT, and
    ``duckdb.df()`` converts HUGEINT to float64 — so the driver's
    canonicalization renders ``3.0`` where Spark's BIGINT renders
    ``3`` and the value hash flips with rows/schema still matching.
    That single mechanism caused all 6 round-6 driver FAILs. Every
    oracle must therefore emit NO HUGEINT (or unsigned-exotic) output
    column; wrap the offending aggregate in CAST(... AS BIGINT)."""
    banned = ("HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")
    offenders = {}
    from tests.conftest import SF_DIR

    for key in ORACLE_KEYS:
        desc = duck.execute(
            f"DESCRIBE ({_oracle_for(key, SF_DIR)})"
        ).fetchall()
        hits = [
            (col, typ)
            for col, typ, *_ in desc
            if any(b in typ.upper() for b in banned)
        ]
        if hits:
            offenders[key] = hits
    assert not offenders, f"HUGEINT-typed oracle columns: {offenders}"


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_entry_exports_cover_registry():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 50


def test_driver_order_in_sync_with_registry():
    """DRIVER_ORDER must name every registered key exactly once, and
    every key the driver still owes a row at its current contract
    strength (never proven, or oracle-backed without a hash row — the
    r7 verdict's re-certification hole) must come before every
    certified key (derived from the CORRECTNESS_r*.json artifacts, so
    the order can never go stale after a driver round)."""
    assert sorted(entrymod.DRIVER_ORDER) == sorted(QUERIES)
    assert len(set(entrymod.DRIVER_ORDER)) == len(entrymod.DRIVER_ORDER)
    owed = entrymod.driver_uncertified()
    flags = [k in owed for k in entrymod.DRIVER_ORDER]
    n_fresh = flags.count(True)
    assert all(flags[:n_fresh]), "a certified key precedes an owed key"
    assert not any(flags[n_fresh:]), "an owed key trails a certified key"
    assert list(entrymod.queries()) == entrymod.DRIVER_ORDER


def test_driver_order_fronts_recertification_keys():
    """The r7 verdict's concrete stranding case: every oracle-backed
    key whose only green rows predate its oracle must sit in the front
    (uncertified) block, not at its original priority position."""
    owed = entrymod.driver_uncertified()
    proven = entrymod.driver_proven()
    upgraded = {k for k in owed if k in proven and k in ORACLES}
    n_front = len(owed)
    for k in upgraded:
        pos = entrymod.DRIVER_ORDER.index(k)
        assert pos < n_front, f"{k} stranded at position {pos}"


def test_oracle_fingerprints_current():
    """ORACLE_FP.json must cover every registered oracle with its
    CURRENT text's fingerprint — the gate that forces a
    ``python tools/oracle_fp.py`` rerun (which re-opens certification
    at the current round) whenever an oracle is added or edited. A
    stale snapshot would silently resurrect the r8-advice 'sticky
    hash' hole: a strengthened oracle riding an old hash row."""
    fps = entrymod._oracle_fp_records()
    assert fps, "ORACLE_FP.json missing — run python tools/oracle_fp.py"
    # fingerprints cover the DRIVER-tier text: built oracles resolve
    # at the sf0.01 contract dir, same as tools/oracle_fp.py
    oracles = entrymod._resolved_oracles()
    missing = sorted(set(oracles) - set(fps))
    assert not missing, f"oracles without fingerprint snapshot: {missing}"
    stale = sorted(
        k
        for k in oracles
        if fps[k].get("fp") != entrymod.oracle_fp(oracles[k])
    )
    assert not stale, (
        f"oracle text changed without snapshot update: {stale} — "
        "run python tools/oracle_fp.py"
    )
    dangling = sorted(set(fps) - set(oracles))
    assert not dangling, f"snapshot entries for unregistered keys: {dangling}"


def test_oracle_fingerprint_change_reopens_certification(monkeypatch):
    """Strengthening an oracle (text change) or bumping its effective
    round past the last hash row must mark the key uncertified."""
    key = "agg_global"
    assert key in ORACLES and key not in entrymod.driver_uncertified()
    fps = dict(entrymod._oracle_fp_records())
    # 1) text drift: snapshot fp no longer matches the registry text
    drift = dict(fps)
    drift[key] = {"fp": "0" * 16, "round": drift[key]["round"]}
    monkeypatch.setattr(entrymod, "_oracle_fp_records", lambda: drift)
    assert key in entrymod.driver_uncertified()
    # 2) round bump: same text, but effective round after the last
    # hash row (the driver certified an OLDER text that round)
    bump = dict(fps)
    bump[key] = {"fp": entrymod.oracle_fp(ORACLES[key]), "round": 99}
    monkeypatch.setattr(entrymod, "_oracle_fp_records", lambda: bump)
    assert key in entrymod.driver_uncertified()
