"""Registry integrity: exactly 50 slots, broken modules fail loudly
instead of silently shrinking ``queries()`` (VERDICT r01 #4)."""

from __future__ import annotations

import importlib

import pytest

from data_ingestion_api_system_loop_ai_spark import registry


def test_registry_has_exactly_50_slots():
    assert len(registry.QUERIES) == 50
    # every oracle belongs to a registered query
    assert set(registry.ORACLES) <= set(registry.QUERIES)
    # round-9 rotation: zero no-oracle rows — every registered query is
    # hash-checkable (q_assign_ids, the one permanently-unhashable op,
    # moved to the unregistered surface; semantics pinned in
    # tests/test_pipeline_semantics.py)
    assert set(registry.QUERIES) == set(registry.ORACLES)


def test_transitive_import_error_is_not_swallowed(monkeypatch):
    """A module that exists but fails to import (broken dependency,
    typo'd symbol) must raise, not shrink the registry."""
    monkeypatch.setattr(registry, "QUERIES", {})
    monkeypatch.setattr(registry, "ORACLES", {})

    def broken_import(name, package=None):
        raise ModuleNotFoundError(
            "No module named 'numpy_typo'", name="numpy_typo"
        )

    monkeypatch.setattr(importlib, "import_module", broken_import)
    with pytest.raises(ModuleNotFoundError, match="numpy_typo"):
        registry._optional_modules()


def test_absent_module_is_skipped_with_warning(monkeypatch):
    """Only the module's own absence is skippable (with a warning)."""
    monkeypatch.setattr(registry, "QUERIES", {})
    monkeypatch.setattr(registry, "ORACLES", {})

    def absent_import(name, package=None):
        full = package + name
        raise ModuleNotFoundError(f"No module named '{full}'", name=full)

    monkeypatch.setattr(importlib, "import_module", absent_import)
    with pytest.warns(UserWarning, match="absent"):
        registry._optional_modules()
    assert registry.QUERIES == {}


# ---------------------------------------------------------------------------
# Oracle output-type lint (VERDICT r05 #2). Three cross-engine type traps
# have shipped so far (NTZ-micros, FLOAT->DECIMAL, HUGEINT-from-sum);
# this executes DESCRIBE on every registered oracle in DuckDB and asserts
# each output column lands in the Spark/Arrow-portable set. A DuckDB
# HUGEINT (what integer sum() widens to) degrades to float64 through the
# driver's Arrow/pandas fetch and silently breaks the value hash even
# when both engines agree value-for-value.
# ---------------------------------------------------------------------------

_PORTABLE_BASE_TYPES = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
}


def _is_portable(duck_type: str) -> bool:
    t = duck_type.strip().upper()
    while t.endswith("[]"):  # one or more list levels of a portable leaf
        t = t[:-2].strip()
    if t.startswith("DECIMAL("):
        return True  # explicitly declared precision is a deliberate choice
    return t in _PORTABLE_BASE_TYPES


def test_every_oracle_output_type_is_portable(sf_dir):
    from tests.oracle_utils import duckdb_con

    con = duckdb_con(sf_dir)
    offenders = []
    for name, sql in registry.ORACLES.items():
        for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
            if not _is_portable(typ):
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracles emit non-portable DuckDB types (HUGEINT etc. degrade to "
        f"float64 in the driver's Arrow fetch and break the hash): {offenders}"
    )
