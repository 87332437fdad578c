"""Retention sweep for content-addressed index roots (VERDICT r10 #6):
keep-latest-N tombstoning, grace-window reaping, orphan build reaping,
and touch-resurrection — plus the wiring into the stored-index builders."""

from __future__ import annotations

import os

from tdei_extract_load_service_spark.operators.staging import (
    _TOMBSTONE,
    sweep_index_root,
    touch_snapshot,
)


def _snap(root, name, t, marker="_SUCCESS"):
    p = os.path.join(root, name)
    os.makedirs(p)
    open(os.path.join(p, marker), "w").close()
    os.utime(p, (t, t))
    return p


def test_keep_latest_tombstones_then_reaps(tmp_path):
    root = str(tmp_path / "idx")
    for i in range(5):
        _snap(root, f"s{i}", 1000.0 + i)
    r1 = sweep_index_root(root, keep_latest=2, grace_sec=100, now=2000.0)
    assert r1["kept"] == 2 and sorted(r1["tombstoned"]) == ["s0", "s1", "s2"]
    # tombstoned dirs STILL SERVE (logical mark, not a rename)
    for i in range(5):
        assert os.path.isdir(os.path.join(root, f"s{i}"))
    for i in range(3):
        assert os.path.exists(os.path.join(root, f"s{i}", _TOMBSTONE))
    # within grace: nothing reaped
    r2 = sweep_index_root(root, keep_latest=2, grace_sec=100, now=2050.0)
    assert r2["reaped"] == [] and r2["tombstoned"] == []
    # past grace: a LATER sweep physically reaps
    r3 = sweep_index_root(root, keep_latest=2, grace_sec=100, now=2200.0)
    assert sorted(r3["reaped"]) == ["s0", "s1", "s2"]
    assert sorted(os.listdir(root)) == ["s3", "s4"]


def test_touch_resurrects_tombstoned_snapshot(tmp_path):
    root = str(tmp_path / "idx")
    for i in range(3):
        _snap(root, f"s{i}", 1000.0 + i)
    sweep_index_root(root, keep_latest=2, grace_sec=100, now=2000.0)
    assert os.path.exists(os.path.join(root, "s0", _TOMBSTONE))
    touch_snapshot(os.path.join(root, "s0"))
    assert not os.path.exists(os.path.join(root, "s0", _TOMBSTONE))
    # resurrected AND most-recently-used: survives the next sweep
    r = sweep_index_root(root, keep_latest=2, grace_sec=100, now=2200.0)
    assert "s0" not in r["tombstoned"] and "s0" not in r["reaped"]
    assert os.path.isdir(os.path.join(root, "s0"))


def test_orphan_build_dirs_reaped_only_when_builder_dead(tmp_path):
    root = str(tmp_path / "idx")
    os.makedirs(os.path.join(root, "a.build.999999999"))  # dead pid
    os.makedirs(os.path.join(root, f"b.build.{os.getpid()}"))  # alive
    r = sweep_index_root(root, keep_latest=2, grace_sec=100, now=2000.0)
    assert r["orphans_reaped"] == ["a.build.999999999"]
    assert os.path.isdir(os.path.join(root, f"b.build.{os.getpid()}"))


def test_incomplete_snapshot_reaped_after_grace(tmp_path):
    root = str(tmp_path / "idx")
    p = os.path.join(root, "torn")
    os.makedirs(p)
    os.utime(p, (1000.0, 1000.0))
    r1 = sweep_index_root(root, keep_latest=2, grace_sec=100, now=1050.0)
    assert os.path.isdir(p) and r1["reaped"] == []
    r2 = sweep_index_root(root, keep_latest=2, grace_sec=100, now=1200.0)
    assert r2["reaped"] == ["torn"] and not os.path.isdir(p)


def test_builder_touch_and_resurrect_wiring(spark, tmp_path):
    """build_fingerprint_index: a repeat call touches the snapshot (LRU
    recency) and resurrects a tombstoned-but-unreaped one instead of
    rebuilding or serving a doomed path."""
    from tdei_extract_load_service_spark.operators import dedup as D

    base = spark.createDataFrame(
        [(1, "x"), (2, "y")], "doc_id long, text string"
    )
    ck = f"pytest-gc:{tmp_path}"
    path = D.build_fingerprint_index(base, "doc_id", ["text"], corpus_key=ck)
    # tombstone it manually (as a concurrent sweep would)
    open(os.path.join(path, _TOMBSTONE), "w").close()
    again = D.build_fingerprint_index(base, "doc_id", ["text"], corpus_key=ck)
    assert again == path
    assert not os.path.exists(os.path.join(path, _TOMBSTONE))
    assert spark.read.parquet(path).count() == 2
