"""Inventory loading contract: entry ordering for the driver's bounded
correctness window, and loud failure when a submodule can't import
(a silent except-ImportError previously made 34 entries vanish)."""

import sys

import pytest

from warpdb_spark import inventory


def test_driver_priority_entries_come_first():
    q, o = inventory.load_all()
    names = list(q)
    assert names[: len(inventory.DRIVER_PRIORITY)] == inventory.DRIVER_PRIORITY
    # r3 rotation: everything that broke or was never checked must sit
    # inside the driver's ~50-entry window — the recovered events
    # entries, the re-cast q12, the r2 additions, and the entries whose
    # oracles were upgraded this round
    window = names[:50]
    for must in (
        "reshape_pivot",
        "stream_session_windows",
        "window_lag_lead",
        "events_cohort_retention",
        "tpch_q12_priority_lines",
        "agg_grouping_sets",
        "embedding_kmeans_clusters",
        "pipeline_corpus_curation",
        "similarity_ann_lsh",
        "similarity_ivf",
        "window_qualify",
    ):
        assert must in window, must
    # every priority name has a callable; oracle coverage stays declared
    assert all(callable(q[n]) for n in names)
    assert set(o) <= set(q)


def test_unknown_priority_name_raises(monkeypatch):
    monkeypatch.setattr(
        inventory, "DRIVER_PRIORITY", inventory.DRIVER_PRIORITY + ["no_such_entry"]
    )
    with pytest.raises(RuntimeError, match="no_such_entry"):
        inventory.load_all()


def test_submodule_import_failure_is_loud(monkeypatch):
    """If pipeline_ops can't import, load_all must raise — not quietly
    drop its 34 entries and report a greener round than is real."""
    monkeypatch.delattr(inventory, "pipeline_ops", raising=False)
    monkeypatch.delitem(sys.modules, "warpdb_spark.inventory.pipeline_ops", raising=False)
    monkeypatch.setitem(sys.modules, "warpdb_spark.inventory.pipeline_ops", None)
    with pytest.raises(ImportError):
        inventory.load_all()
