"""Column mapping (Delta-style): RENAME/DROP COLUMN are single metadata
commits; physical parquet names never change; every public reader shows
logical names, every public writer supplies them; time travel and RESTORE
show each version under the names it had then."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.sources.txlog import (
    TransactionLog,
    tx_append_partitioned,
    tx_changes,
    tx_clone,
    tx_compact,
    tx_delete_where,
    tx_detail,
    tx_drop_column,
    tx_export_delta_log,
    tx_export_symlink_manifest,
    tx_merge_into,
    tx_read,
    tx_rename_column,
    tx_restore,
    tx_scan,
    tx_scan_eq,
    tx_set_constraint,
    tx_set_generated_column,
    tx_table_schema,
    tx_update_where,
)


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"doc{i}", i % 3, float(i)) for i in range(lo, hi)],
        "id long, body string, p int, score double",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _tbl(spark, tmp_path, n=12, **kw):
    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, n), t, partition_by="p", **kw)
    return t


def _physical_names(t):
    log = TransactionLog(t)
    out = set()
    for rel in log.live_files():
        out |= set(pq.read_schema(os.path.join(t, rel)).names)
    return out


def test_rename_is_metadata_only_and_reads_logical(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    v0 = TransactionLog(t).version()
    files0 = set(TransactionLog(t).live_files())
    tx_rename_column(spark, t, "body", "text")
    # no file touched, one commit
    assert set(TransactionLog(t).live_files()) == files0
    assert TransactionLog(t).version() == v0 + 1
    assert "body" in _physical_names(t)       # footers keep the old name
    assert "text" not in _physical_names(t)
    got = tx_read(spark, t)
    assert "text" in got.columns and "body" not in got.columns
    assert _rows(got.select("id", "text")) == _rows(
        _mk(spark, 0, 12).select("id", F.col("body").alias("text"))
    )
    assert set(tx_table_schema(t)) == {"id", "text", "p", "score"}
    # time travel shows the old name
    old = tx_read(spark, t, version=v0)
    assert "body" in old.columns and "text" not in old.columns


def test_writes_use_logical_names_and_old_name_rejected(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    tx_rename_column(spark, t, "body", "text")
    new = _mk(spark, 12, 18).withColumnRenamed("body", "text")
    tx_append_partitioned(spark, new, t, partition_by="p")
    # the appended file is PHYSICALLY written under the original name
    assert _physical_names(t) == {"id", "body", "p", "score"}
    assert tx_read(spark, t).count() == 18
    assert _rows(tx_read(spark, t).select("id", "text")) == _rows(
        _mk(spark, 0, 18).select("id", F.col("body").alias("text"))
    )
    # stale (physical) name refuses loudly at the schema contract
    with pytest.raises(ValueError, match="body"):
        tx_append_partitioned(
            spark, _mk(spark, 18, 20), t, partition_by="p"
        )


def test_drop_then_rewrites_shed_the_column(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    tx_append_partitioned(spark, _mk(spark, 12, 24), t, partition_by="p")
    tx_drop_column(spark, t, "score")
    got = tx_read(spark, t)
    assert "score" not in got.columns
    assert set(tx_table_schema(t)) == {"id", "body", "p"}
    # appends no longer need (and may not carry) the dropped column
    tx_append_partitioned(
        spark, _mk(spark, 24, 27).drop("score"), t, partition_by="p"
    )
    with pytest.raises(ValueError, match="dropped"):
        tx_append_partitioned(
            spark, _mk(spark, 27, 30), t, partition_by="p"
        )
    assert "score" in _physical_names(t)  # old files still carry it
    removed = tx_compact(spark, t)
    assert removed > 0
    assert "score" not in _physical_names(t)  # rewrite sheds it physically
    assert _rows(tx_read(spark, t).select("id")) == _rows(
        _mk(spark, 0, 27).select("id")
    )


def test_dml_predicates_resolve_logical_names(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    tx_rename_column(spark, t, "score", "quality")
    n = tx_update_where(
        spark, t, {"quality": "quality + 100"}, "quality < 3"
    )
    assert n == 3
    assert (
        tx_read(spark, t).filter("quality >= 100").count() == 3
    )
    # MERGE with t./s. expressions on the renamed column
    src = spark.createDataFrame(
        [(0, 0.5), (99, 9.9)], "id long, quality double"
    )
    res = tx_merge_into(
        spark, t, src, on=["id"],
        when_matched_update={"quality": "s.quality"},
        when_not_matched_insert={
            "id": "s.id", "body": "'new'", "p": "0", "quality": "s.quality",
        },
    )
    assert res["updated"] == 1 and res["inserted"] == 1
    assert _physical_names(t) == {"id", "body", "p", "score"}
    # copy-on-write delete, then DV delete, both on the logical name
    # (updated rows 1/2 sit at 101/102; raw rows 10/11; insert at 9.9)
    assert tx_delete_where(spark, t, "quality > 9") == 5
    assert tx_delete_where(spark, t, "quality = 0.5", mode="dv") == 1
    got = tx_read(spark, t)
    assert got.count() == 7
    assert got.filter("quality = 0.5").count() == 0


def test_scans_prune_via_physical_stats_after_rename(spark, tmp_path):
    t = str(tmp_path / "tbl")
    tx_append_partitioned(
        spark, _mk(spark, 0, 12), t, partition_by="p",
        stats_cols=["id"],
    )
    tx_rename_column(spark, t, "id", "doc_id")
    tx_append_partitioned(
        spark,
        _mk(spark, 12, 24).withColumnRenamed("id", "doc_id"),
        t, partition_by="p", stats_cols=["doc_id"],
    )
    # stats land under the PHYSICAL name both eras — one zone-map key
    acts = TransactionLog(t).live_actions()
    assert all("id" in (a.get("stats") or {}) for a in acts.values())
    got = tx_scan(spark, t, "doc_id", lo=3, hi=20)
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(3, 21))
    hit = tx_scan_eq(spark, t, "doc_id", 17)
    assert [r["doc_id"] for r in hit.collect()] == [17]


def test_guards(spark, tmp_path):
    t = _tbl(spark, tmp_path, assign_row_ids=True)
    # table-managed / layout / missing / collision
    with pytest.raises(ValueError, match="table-managed"):
        tx_rename_column(spark, t, "_row_id", "rid")
    with pytest.raises(ValueError, match="partition layout"):
        tx_rename_column(spark, t, "p", "part")
    with pytest.raises(ValueError, match="partition layout"):
        tx_drop_column(spark, t, "p")
    with pytest.raises(ValueError, match="no column"):
        tx_rename_column(spark, t, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        tx_rename_column(spark, t, "body", "score")
    # constraint / generated-column references refuse
    tx_set_constraint(spark, t, "pos_score", "score >= 0")
    with pytest.raises(ValueError, match="constraint"):
        tx_rename_column(spark, t, "score", "quality")
    with pytest.raises(ValueError, match="constraint"):
        tx_drop_column(spark, t, "score")
    tx_set_generated_column(spark, t, "id2", "id * 2")
    with pytest.raises(ValueError, match="generated"):
        tx_drop_column(spark, t, "id")
    # a dropped physical name may not come back as a rename target
    t2 = str(tmp_path / "tbl2")
    tx_append_partitioned(spark, _mk(spark, 0, 6), t2, partition_by="p")
    tx_drop_column(spark, t2, "body")
    with pytest.raises(ValueError, match="physically"):
        tx_rename_column(spark, t2, "score", "body")


def test_checkpoint_clone_detail_carry_mapping(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    tx_rename_column(spark, t, "body", "text")
    tx_drop_column(spark, t, "score")
    log = TransactionLog(t)
    log.checkpoint()
    renames, dropped = TransactionLog(t).column_mapping()
    assert renames == {"body": "text"} and dropped == {"score"}
    det = tx_detail(t)
    assert det["column_mapping"] == {
        "renames": {"body": "text"}, "dropped": ["score"],
    }
    c = str(tmp_path / "clone")
    tx_clone(spark, t, c)
    assert TransactionLog(c).column_mapping() == (
        {"body": "text"}, {"score"},
    )
    assert "text" in tx_read(spark, c).columns


def test_restore_across_rename_restores_names(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    v0 = TransactionLog(t).version()
    tx_rename_column(spark, t, "body", "text")
    tx_append_partitioned(
        spark,
        _mk(spark, 12, 18).withColumnRenamed("body", "text"),
        t, partition_by="p",
    )
    res = tx_restore(spark, t, v0)
    assert res["restored_to"] == v0
    got = tx_read(spark, t)
    assert "body" in got.columns and "text" not in got.columns
    assert got.count() == 12
    # and the rename is itself restorable (time travel both sides)
    assert "text" in tx_read(spark, t, version=v0 + 2).columns


def test_raw_file_surfaces_refuse_under_mapping(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.pyds import (
        register_txlog_source,
    )

    t = _tbl(spark, tmp_path)
    tx_rename_column(spark, t, "body", "text")
    with pytest.raises(ValueError, match="column mapping"):
        tx_export_symlink_manifest(t)
    register_txlog_source(spark)
    with pytest.raises(Exception, match="column mapping"):
        spark.read.format("txlog").option("path", t).load().collect()


def test_cdf_reports_logical_names(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    v_pre = TransactionLog(t).version()
    tx_rename_column(spark, t, "body", "text")
    tx_update_where(spark, t, {"text": "'edited'"}, "id = 1")
    ch = tx_changes(spark, t, since=v_pre)
    assert "text" in ch.columns and "body" not in ch.columns
    rows = {
        (r["_change_type"], r["text"])
        for r in ch.filter("id = 1").collect()
    }
    assert rows == {("delete", "doc1"), ("insert", "edited")}


# ---------------------------------------------------------------------------
# ADD COLUMN (metadata-only, per-file default fill)
# ---------------------------------------------------------------------------


def test_add_column_fills_default_per_file(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.txlog import tx_add_column

    t = _tbl(spark, tmp_path)  # 12 rows, no 'lang' column
    files0 = set(TransactionLog(t).live_files())
    tx_add_column(spark, t, "lang", "string", default="'en'")
    assert set(TransactionLog(t).live_files()) == files0  # no rewrite
    got = tx_read(spark, t)
    assert got.filter("lang = 'en'").count() == 12
    assert tx_table_schema(t)["lang"] == "string"
    # a later batch MAY supply the column — its values win for its file
    batch = _mk(spark, 12, 15).withColumn("lang", F.lit("fr"))
    tx_append_partitioned(spark, batch, t, partition_by="p")
    got = tx_read(spark, t)
    assert got.filter("lang = 'fr'").count() == 3
    assert got.filter("lang = 'en'").count() == 12
    # ... or omit it — old default still applies to files lacking it
    tx_append_partitioned(spark, _mk(spark, 15, 17), t, partition_by="p")
    assert tx_read(spark, t).filter("lang = 'en'").count() == 14
    # rewrites materialize the declared column physically
    tx_compact(spark, t)
    assert "lang" in _physical_names(t)
    assert tx_read(spark, t).filter("lang = 'en'").count() == 14


def test_add_column_null_default_and_dml(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.txlog import tx_add_column

    t = _tbl(spark, tmp_path)
    tx_add_column(spark, t, "flag", "int")
    assert tx_read(spark, t).filter("flag IS NULL").count() == 12
    # DML predicates and SETs resolve the declared column
    n = tx_update_where(spark, t, {"flag": "1"}, "id < 5 AND flag IS NULL")
    assert n == 5
    got = tx_read(spark, t)
    assert got.filter("flag = 1").count() == 5
    assert tx_delete_where(spark, t, "flag = 1", mode="dv") == 5
    assert tx_read(spark, t).count() == 7


def test_add_column_guards_and_time_travel(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.txlog import tx_add_column

    t = _tbl(spark, tmp_path)
    v0 = TransactionLog(t).version()
    with pytest.raises(ValueError, match="already exists"):
        tx_add_column(spark, t, "body", "string")
    with pytest.raises(Exception):
        tx_add_column(spark, t, "bad", "not_a_type")
    tx_drop_column(spark, t, "body")
    with pytest.raises(ValueError, match="physically"):
        tx_add_column(spark, t, "body", "string")
    tx_add_column(spark, t, "lang", "string", default="'en'")
    # time travel: the column does not exist before its add version
    assert "lang" not in tx_read(spark, t, version=v0).columns
    assert "lang" in tx_read(spark, t).columns
    # rename of a declared column keeps the fill rule attached
    tx_rename_column(spark, t, "lang", "language")
    assert tx_read(spark, t).filter("language = 'en'").count() == 12
    # dropping it retires the fill rule
    tx_drop_column(spark, t, "language")
    assert "language" not in tx_read(spark, t).columns
    assert TransactionLog(t).schema_addenda() == {}


def test_add_column_checkpoint_clone_restore(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.txlog import tx_add_column

    t = _tbl(spark, tmp_path)
    v0 = TransactionLog(t).version()
    tx_add_column(spark, t, "lang", "string", default="'en'")
    TransactionLog(t).checkpoint()
    assert TransactionLog(t).schema_addenda() == {
        "lang": {"type": "string", "default": "'en'"},
    }
    c = str(tmp_path / "clone")
    tx_clone(spark, t, c)
    assert tx_read(spark, c).filter("lang = 'en'").count() == 12
    tx_restore(spark, t, v0)
    assert "lang" not in tx_read(spark, t).columns
    assert TransactionLog(t).schema_addenda() == {}
    det = tx_detail(c)
    assert det["schema_addenda"] == {
        "lang": {"type": "string", "default": "'en'"},
    }


# ---------------------------------------------------------------------------
# ALTER verbs under concurrency
# ---------------------------------------------------------------------------


def test_alter_verbs_race_with_appends(spark, tmp_path):
    """A rename committed between another writer's stage and commit must
    not corrupt either: physical names never change, so files staged
    under the pre-rename state stay valid, the losing committer retries
    off the fresh snapshot, and the final table reads consistently under
    the post-rename logical schema."""
    import threading

    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        tx_add_column,
    )

    t = _tbl(spark, tmp_path)
    errs = []

    def renamer():
        try:
            tx_rename_column(spark, t, "body", "text")
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    def adder():
        try:
            tx_add_column(spark, t, "lang", "string", default="'en'")
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    threads = [threading.Thread(target=renamer), threading.Thread(target=adder)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    # both metadata commits landed (CAS retry serialized them)
    log = TransactionLog(t)
    assert log.column_mapping()[0] == {"body": "text"}
    assert set(log.schema_addenda()) == {"lang"}
    got = tx_read(spark, t)
    assert "text" in got.columns and "lang" in got.columns
    assert got.filter("lang = 'en'").count() == 12
    # a post-race append under the merged logical schema round-trips
    batch = (
        _mk(spark, 12, 15)
        .withColumnRenamed("body", "text")
        .withColumn("lang", F.lit("fr"))
    )
    tx_append_partitioned(spark, batch, t, partition_by="p")
    assert tx_read(spark, t).count() == 15
    assert tx_read(spark, t).filter("lang = 'fr'").count() == 3


# ---------------------------------------------------------------------------
# Type widening (ALTER COLUMN TYPE, metadata-only)
# ---------------------------------------------------------------------------


def test_widen_column_reads_and_writes_wide(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        tx_widen_column,
    )

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(12)],
        "id int, p int, score double",
    )
    tx_append_partitioned(spark, df, t, partition_by="p")
    files0 = set(TransactionLog(t).live_files())
    tx_widen_column(spark, t, "id", "bigint")
    assert set(TransactionLog(t).live_files()) == files0  # no rewrite
    got = tx_read(spark, t)
    assert dict(got.dtypes)["id"] == "bigint"
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(12))
    assert tx_table_schema(t)["id"] == "bigint"
    # a narrower batch upcasts at staging; a wide batch writes as-is
    tx_append_partitioned(
        spark,
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(12, 15)],
            "id int, p int, score double",
        ),
        t, partition_by="p",
    )
    tx_append_partitioned(
        spark,
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(15, 18)],
            "id bigint, p int, score double",
        ),
        t, partition_by="p",
    )
    got = tx_read(spark, t)
    assert dict(got.dtypes)["id"] == "bigint"
    assert got.count() == 18
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(18))
    # post-widen files are PHYSICALLY wide; pre-widen files still narrow
    import pyarrow.parquet as pq

    types = {
        str(pq.read_schema(os.path.join(t, rel)).field("id").type)
        for rel in TransactionLog(t).live_files()
    }
    assert types == {"int32", "int64"}
    # rewrite migrates everything to the wide type
    tx_compact(spark, t)
    types = {
        str(pq.read_schema(os.path.join(t, rel)).field("id").type)
        for rel in TransactionLog(t).live_files()
    }
    assert types == {"int64"}
    assert tx_read(spark, t).agg(F.sum("id")).collect()[0][0] == sum(range(18))


def test_widen_guards_and_dml(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        tx_widen_column,
    )

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(12)],
        "id int, p int, score float",
    )
    tx_append_partitioned(spark, df, t, partition_by="p")
    with pytest.raises(ValueError, match="lossless"):
        tx_widen_column(spark, t, "id", "smallint")  # narrowing refused
    with pytest.raises(ValueError, match="lossless"):
        tx_widen_column(spark, t, "score", "int")
    with pytest.raises(ValueError, match="no column"):
        tx_widen_column(spark, t, "nope", "bigint")
    tx_widen_column(spark, t, "score", "double")
    with pytest.raises(ValueError, match="already"):
        tx_widen_column(spark, t, "score", "double")
    # DML over the widened view: predicate + SET keep the wide type
    n = tx_update_where(spark, t, {"score": "score * 2"}, "id >= 6")
    assert n == 6
    got = tx_read(spark, t)
    assert dict(got.dtypes)["score"] == "double"
    assert got.filter("score >= 12").count() == 6
    # time travel shows the narrow type before the widening
    assert dict(tx_read(spark, t, version=0).dtypes)["score"] == "float"


def test_widen_stacks_with_rename_addendum_and_carries(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        tx_add_column,
        tx_widen_column,
    )

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(6)], "id int, p int"
    )
    tx_append_partitioned(spark, df, t, partition_by="p")
    v0 = TransactionLog(t).version()
    tx_rename_column(spark, t, "id", "doc_id")
    tx_widen_column(spark, t, "doc_id", "bigint")  # via the logical name
    tx_add_column(spark, t, "views", "int", default="0")
    tx_widen_column(spark, t, "views", "bigint")  # widen an addendum
    got = tx_read(spark, t)
    assert dict(got.dtypes)["doc_id"] == "bigint"
    assert dict(got.dtypes)["views"] == "bigint"
    assert got.filter("views = 0").count() == 6
    log = TransactionLog(t)
    assert log.type_widening() == {"id": "bigint", "views": "bigint"}
    assert log.schema_addenda()["views"]["type"] == "bigint"
    log.checkpoint()
    assert TransactionLog(t).type_widening() == {
        "id": "bigint", "views": "bigint",
    }
    c = str(tmp_path / "clone")
    tx_clone(spark, t, c)
    assert dict(tx_read(spark, c).dtypes)["doc_id"] == "bigint"
    tx_restore(spark, t, v0)
    assert dict(tx_read(spark, t).dtypes)["id"] == "int"
    assert TransactionLog(t).type_widening() == {}
    with pytest.raises(ValueError, match="type widening"):
        tx_export_delta_log(c)


def test_delta_export_emits_column_mapping(spark, tmp_path):
    """Pure name state (renames/drops) exports as a real Delta
    columnMapping=name table: reader 2 / writer 5 protocol, every field
    carrying its physicalName, dropped columns absent — and the
    dependency-free reader resolves it back to the logical view."""
    import json as _json

    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        tx_read_delta_export,
    )

    t = _tbl(spark, tmp_path)
    tx_rename_column(spark, t, "body", "text")
    tx_drop_column(spark, t, "score")
    root = tx_export_delta_log(t)
    commit = os.path.join(root, "_delta_log", f"{0:020d}.json")
    actions = [_json.loads(line) for line in open(commit)]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto == {"minReaderVersion": 2, "minWriterVersion": 5}
    md = next(a["metaData"] for a in actions if "metaData" in a)
    assert md["configuration"]["delta.columnMapping.mode"] == "name"
    fields = _json.loads(md["schemaString"])["fields"]
    by_name = {f["name"]: f for f in fields}
    assert set(by_name) == {"id", "text", "p"}  # logical; score dropped
    assert (
        by_name["text"]["metadata"]["delta.columnMapping.physicalName"]
        == "body"
    )
    assert all(
        "delta.columnMapping.id" in f["metadata"] for f in fields
    )
    got = tx_read_delta_export(spark, root)
    assert sorted(got.columns) == ["id", "p", "text"]
    cols = sorted(got.columns)
    assert _rows(got.select(cols)) == _rows(tx_read(spark, t).select(cols))
