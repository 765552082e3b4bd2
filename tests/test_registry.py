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
    # the single rows-only-by-design entry (uuid/current_timestamp)
    assert set(registry.QUERIES) - set(registry.ORACLES) == {"q_assign_ids"}


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
