"""Round-8 txlog hardening: ALTERed-table reads group files from LOG
metadata (zero driver-side footer I/O — the 100 TB read-path contract),
compaction converges onto a declared spec for unpartitioned and renamed
layouts, restore-across-rename retires the mapping state, and
live_actions hands out copies, never the shared cached dicts."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.sources import txlog as TX
from cars_bids_data_pipeline_v0__spark.sources.txlog import (
    TransactionLog,
    tx_add_column,
    tx_append_partitioned,
    tx_compact,
    tx_delete_where,
    tx_export_symlink_manifest,
    tx_read,
    tx_rename_column,
    tx_restore,
    tx_set_partition_spec,
    tx_widen_column,
)


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"doc{i}", i % 3, i % 2) for i in range(lo, hi)],
        "id int, s string, p int, q int",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _clear_caches():
    TX._FOOTER_META_CACHE.clear()
    TX._COMMIT_BODY_CACHE.clear()
    TX._ALTER_STATE_CACHE.clear()


@pytest.fixture()
def footer_counter(monkeypatch):
    """Count every driver-side parquet footer open (read_schema AND
    ParquetFile — _footer_meta uses the latter) with a path log."""
    import pyarrow.parquet as pq

    calls = {"n": 0, "paths": []}
    real_rs, real_pf = pq.read_schema, pq.ParquetFile

    def counting_rs(path, *a, **kw):
        calls["n"] += 1
        calls["paths"].append(str(path))
        return real_rs(path, *a, **kw)

    def counting_pf(path, *a, **kw):
        calls["n"] += 1
        calls["paths"].append(str(path))
        return real_pf(path, *a, **kw)

    monkeypatch.setattr(pq, "read_schema", counting_rs)
    monkeypatch.setattr(pq, "ParquetFile", counting_pf)
    return calls


def test_altered_table_read_needs_no_footer_io(spark, tmp_path, footer_counter):
    """tx_read of a table whose add actions carry the schema signature
    must not open a single parquet footer on the driver, even with
    ADD COLUMN + type widening in force (VERDICT r7 directive #1)."""
    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, 8), t, partition_by="p")
    tx_add_column(spark, t, "flag", "int", default="7")
    tx_widen_column(spark, t, "id", "bigint")
    tx_append_partitioned(spark, _mk(spark, 8, 16), t, partition_by="p")
    _clear_caches()
    footer_counter["n"] = 0
    got = tx_read(spark, t)
    assert got.count() == 16
    assert footer_counter["n"] == 0
    assert dict(got.dtypes)["id"] == "bigint"
    assert {r[0] for r in got.select("flag").distinct().collect()} == {7}
    # the DML discovery scan takes the same metadata-only path:
    # stage-time footer reads of FRESHLY staged files are fine (one
    # local read per new file at write time); what must never happen
    # is a footer read of a pre-existing live file during discovery
    pre_existing = set(TransactionLog(t).live_files())
    footer_counter["paths"].clear()
    tx_delete_where(spark, t, "id = 3")
    read_back = {
        os.path.relpath(p, t)
        for p in footer_counter["paths"]
        if os.path.commonpath([os.path.abspath(p), os.path.abspath(t)])
        == os.path.abspath(t)
    }
    assert not (read_back & pre_existing)
    assert tx_read(spark, t).count() == 15


def test_stage_records_schema_signature(spark, tmp_path):
    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, 6), t, partition_by="p")
    acts = TransactionLog(t).live_actions()
    for a in acts.values():
        cols = a.get("cols")
        assert cols is not None
        assert set(cols) == {"id", "s", "p", "q"}
        assert cols["id"] == "int32" and cols["s"] == "string"
        assert a.get("rows", 0) > 0
    assert sum(a["rows"] for a in acts.values()) == 6


def test_legacy_actions_fall_back_to_memoized_footer_read(
    spark, tmp_path, footer_counter
):
    """Actions staged before the ``cols`` field existed (simulated by
    stripping it from the committed log) still read correctly — one
    footer pass per process, memoized thereafter."""
    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, 8), t, partition_by="p")
    tx_add_column(spark, t, "flag", "int", default="1")
    # strip cols from every committed add action (legacy-log simulation)
    logdir = os.path.join(t, "_txlog")
    for name in os.listdir(logdir):
        if not name.endswith(".json"):
            continue
        p = os.path.join(logdir, name)
        with open(p) as f:
            body = json.load(f)
        for a in body.get("add", []):
            a.pop("cols", None)
            a.pop("rows", None)
        with open(p, "w") as f:
            json.dump(body, f)
    _clear_caches()
    n_live = len(TransactionLog(t).live_files())
    footer_counter["n"] = 0
    assert tx_read(spark, t).count() == 8
    assert footer_counter["n"] == n_live  # one read per legacy file
    assert tx_read(spark, t).count() == 8
    assert footer_counter["n"] == n_live  # memoized: no second pass


def test_compact_migrates_unpartitioned_table_to_new_spec(spark, tmp_path):
    """ADVICE r7: an all-unpartitioned table with a freshly declared
    spec must migrate to the spec layout and CONVERGE (second compact
    is a no-op), not rewrite-forever down the coalesce(1) branch."""
    t = str(tmp_path / "tbl")
    log = TransactionLog(t)
    a0 = log.stage_dataframe(_mk(spark, 0, 6))
    assert log.try_commit(0, a0, [], op="append")
    a1 = log.stage_dataframe(_mk(spark, 6, 12))
    assert log.try_commit(1, a1, [], op="append")
    tx_set_partition_spec(spark, t, "p")
    removed = tx_compact(spark, t)
    assert removed > 0
    live = TransactionLog(t).live_actions()
    assert {a.get("partition_col") for a in live.values()} == {"p"}
    assert {a.get("partition") for a in live.values()} == {"0", "1", "2"}
    assert _rows(tx_read(spark, t)) == _rows(_mk(spark, 0, 12))
    assert tx_compact(spark, t) == 0  # converged


def test_compact_converges_when_spec_names_renamed_column(spark, tmp_path):
    """ADVICE r7: the declared spec is a LOGICAL name; files record the
    PHYSICAL layout column.  A spec naming a renamed column must still
    converge — off_spec compares through the rename map."""
    t = str(tmp_path / "tbl")
    log = TransactionLog(t)
    a0 = log.stage_dataframe(_mk(spark, 0, 6))
    assert log.try_commit(0, a0, [], op="append")
    # rename BEFORE any layout use (the guard permits this), then
    # declare the spec under the NEW logical name
    tx_rename_column(spark, t, "p", "part")
    tx_set_partition_spec(spark, t, "part")
    assert tx_compact(spark, t) > 0
    live = TransactionLog(t).live_actions()
    # files record the physical name; off_spec translates, so:
    assert {a.get("partition_col") for a in live.values()} == {"p"}
    assert tx_compact(spark, t) == 0  # converged, not rewrite-forever
    got = tx_read(spark, t)
    assert "part" in got.columns and "p" not in got.columns
    assert got.count() == 6


def test_restore_across_rename_retires_mapping_state(spark, tmp_path):
    """ADVICE r7: a restore that rolls back a rename commits an EMPTY
    mapping snapshot — that must normalize to 'no mapping in force' so
    the raw-file surfaces (symlink export, pyds) work again."""
    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, 6), t, partition_by="p")
    v0 = TransactionLog(t).version()
    tx_rename_column(spark, t, "s", "body")
    assert TransactionLog(t).column_mapping_raw() is not None
    tx_restore(spark, t, v0)
    assert TransactionLog(t).column_mapping_raw() is None
    # refusal sites unlock
    tx_export_symlink_manifest(t)
    got = tx_read(spark, t)
    assert "s" in got.columns and got.count() == 6


def test_rename_then_rename_back_is_identity_mapping(spark, tmp_path):
    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, 6), t, partition_by="p")
    tx_rename_column(spark, t, "s", "body")
    tx_rename_column(spark, t, "body", "s")
    assert TransactionLog(t).column_mapping_raw() is None
    tx_export_symlink_manifest(t)  # no refusal
    # and a fresh rename still works on the clean slate
    tx_rename_column(spark, t, "s", "text")
    assert "text" in tx_read(spark, t).columns


def test_history_and_row_accounting_need_no_footer_io(
    spark, tmp_path, footer_counter
):
    """DESCRIBE HISTORY and row-tracking accounting consume the row
    counts recorded in add actions — zero driver-side footer opens on a
    rows-carrying log."""
    from cars_bids_data_pipeline_v0__spark.sources.txlog import tx_history

    t = str(tmp_path / "tbl")
    tx_append_partitioned(
        spark, _mk(spark, 0, 8), t, partition_by="p", assign_row_ids=True
    )
    tx_append_partitioned(spark, _mk(spark, 8, 12), t, partition_by="p")
    _clear_caches()
    footer_counter["n"] = 0
    hist = tx_history(spark, t).orderBy("version").collect()
    assert [r["rows_added"] for r in hist] == [8, 4]
    assert footer_counter["n"] == 0
    # row ids continued across the appends (accounting from the log)
    got = tx_read(spark, t)
    ids = sorted(r["_row_id"] for r in got.collect())
    assert ids == list(range(12))


def test_version_at_timestamp_binary_search(spark, tmp_path):
    """TIMESTAMP AS OF resolves by bisection over monotone commit times
    — same answers as a linear scan at every probe point."""
    t = str(tmp_path / "tbl")
    log = TransactionLog(t)
    for v in range(6):
        adds = log.stage_dataframe(_mk(spark, v, v + 1))
        assert log.try_commit(v, adds, [], op="append")
    ts = [log._commit_ts(v) for v in range(6)]
    assert ts == sorted(ts)
    for v in range(6):
        assert log.version_at_timestamp(ts[v]) >= v  # ties roll forward
        if v + 1 < 6 and ts[v + 1] > ts[v]:
            mid = (ts[v] + ts[v + 1]) / 2
            assert log.version_at_timestamp(mid) == v
    assert log.version_at_timestamp(ts[-1] + 60) == 5
    with pytest.raises(ValueError, match="at or before"):
        log.version_at_timestamp(ts[0] - 60)


def test_tx_count_is_metadata_only_and_tracks_lifecycle(
    spark, tmp_path, footer_counter
):
    """Metadata COUNT(*) equals the scan count through appends, DV
    deletes, purge, and time travel — with zero data-file footer opens
    on a rows-carrying log (DV footers only, bounded by deletes)."""
    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        tx_count,
        tx_purge_dvs,
    )

    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, 10), t, partition_by="p")
    v0 = TransactionLog(t).version()
    tx_append_partitioned(spark, _mk(spark, 10, 16), t, partition_by="p")
    tx_delete_where(spark, t, "id % 4 = 1", mode="dv")
    _clear_caches()
    footer_counter["paths"].clear()
    for version in (None, v0):
        assert tx_count(t, version=version) == tx_read(
            spark, t, version=version
        ).count()
    data_files = set(TransactionLog(t).live_files())
    opened = {
        os.path.relpath(p, t) for p in footer_counter["paths"]
        if p.startswith(t)
    }
    assert not (opened & data_files)  # only DV footers were opened
    tx_purge_dvs(spark, t, partition_by="p")
    assert tx_count(t) == tx_read(spark, t).count()
    with pytest.raises(ValueError, match="version OR timestamp"):
        tx_count(t, version=0, timestamp=1.0)
    assert tx_count(str(tmp_path / "absent")) == 0


def test_auto_checkpoint_policy(spark, tmp_path):
    """tx_auto_checkpoint fires only when the log grew `every` commits
    past the newest checkpoint — bounded replay for unbounded streams,
    a metadata no-op otherwise."""
    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        tx_auto_checkpoint,
    )

    t = str(tmp_path / "tbl")
    assert tx_auto_checkpoint(t) is None  # absent table: no-op
    log = TransactionLog(t)
    for v in range(5):
        adds = log.stage_dataframe(_mk(spark, v, v + 1))
        assert log.try_commit(v, adds, [], op="append")
    assert tx_auto_checkpoint(t, every=10) is None  # not due yet
    assert tx_auto_checkpoint(t, every=3) == 4      # due: checkpoints v4
    assert tx_auto_checkpoint(t, every=3) is None   # just checkpointed
    for v in range(5, 8):
        adds = log.stage_dataframe(_mk(spark, v, v + 1))
        assert log.try_commit(v, adds, [], op="append")
    assert tx_auto_checkpoint(t, every=3) == 7      # grew 3 past base
    # reads replay from the checkpoint and still see everything
    assert tx_read(spark, t).count() == 8


def test_vacuum_retention_window(spark, tmp_path):
    """VACUUM RETAIN N HOURS (Delta's tombstone-expiry rule): files
    removed longer ago than the window are deleted, files removed
    inside it (and live files) survive, and a re-add clears the
    tombstone.  The clock is pinned via `now` for determinism."""
    t = str(tmp_path / "tbl")
    log = TransactionLog(t)
    a0 = log.stage_dataframe(_mk(spark, 0, 4))
    assert log.try_commit(0, a0, [], op="append")
    old_files = [a["path"] for a in a0]
    a1 = log.stage_dataframe(_mk(spark, 0, 4))
    # v1 rewrites: removes v0's files (their tombstone time = v1's ts)
    assert log.try_commit(1, a1, old_files, op="replace")
    t1 = log._commit_ts(1)
    # window still covers the remove: nothing to delete
    assert log.vacuum(retention_hours=1.0, now=t1 + 60, dry_run=True) == []
    # window expired: exactly the removed files are listed, then deleted
    victims = log.vacuum(
        retention_hours=1.0, now=t1 + 7200, dry_run=True
    )
    assert sorted(victims) == sorted(old_files)
    assert log.vacuum(retention_hours=1.0, now=t1 + 7200) == len(old_files)
    assert tx_read(spark, t).count() == 4  # live snapshot intact
    # live files never expire no matter how old
    assert log.vacuum(retention_hours=0.0, now=t1 + 10**9) == 0


def test_vacuum_retention_readd_clears_tombstone(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        tx_append_partitioned,
        tx_restore,
    )

    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, 4), t, partition_by="p")
    log = TransactionLog(t)
    v0_files = sorted(log.live_files())
    a1 = log.stage_dataframe(_mk(spark, 0, 4))
    assert log.try_commit(1, a1, v0_files, op="replace")
    tx_restore(spark, t, 0)  # re-adds v0's files: tombstones cleared
    t2 = TransactionLog(t)._commit_ts(2)
    assert TransactionLog(t).vacuum(
        retention_hours=0.0, now=t2 + 10**9, dry_run=True
    ) == sorted(a["path"] for a in a1)  # only v1's files expire
    assert tx_read(spark, t).count() == 4


def test_live_actions_returns_copies(spark, tmp_path):
    """ADVICE r7: mutating a returned action must not corrupt later
    snapshots (commit bodies are shared via the module cache)."""
    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, 6), t, partition_by="p")
    log = TransactionLog(t)
    first = log.live_actions()
    for a in first.values():
        a["partition"] = "CORRUPTED"
        a.pop("cols", None)
    again = TransactionLog(t).live_actions()
    assert {a.get("partition") for a in again.values()} == {"0", "1", "2"}
    assert all(a.get("cols") for a in again.values())
