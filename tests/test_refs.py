"""Named refs (branches + tags) and the write-audit-publish flow.

Reference behavior modeled: Iceberg refs (branch/tag retention) and
the WAP pattern the reference's batch pipeline gets from Iceberg's
spark.wap.branch — waves audited on a branch are invisible to main
readers until an atomic fast-forward publish.  Invariants: branch
isolation, atomic publish, publish-conflict on diverged main, tag
immutability, expiry pinning of ref-reachable history, rollback as a
pointer move, and off-chain sweep after drop_ref/rollback.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from webextract.icetable import CommitConflict, IceTable


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.lpad(F.col("id").cast("string"), 4, "0"))
        .alias("url"))


def _commit(tbl, spark, df, part_id, branch=None, expected=...):
    out = tbl.staging_dir(f"w{part_id}", 0)
    df.coalesce(1).write.mode("overwrite").parquet(out)
    files = sorted(os.path.join(out, fn) for fn in os.listdir(out)
                   if fn.endswith(".parquet")
                   and not fn.startswith((".", "_")))
    return tbl.commit(f"w{part_id}",
                      [{"part_id": part_id, "files": files,
                        "counters": {}}], "t", branch=branch,
                      expected_parent=expected)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_wap_branch_isolation_publish_tag_rollback(spark, tmp_path):
    tbl = IceTable(str(tmp_path / "t"))
    _commit(tbl, spark, _frame(spark, 0, 10), 0)
    main_before = tbl.current_snapshot_id()

    tbl.create_branch("audit")
    _commit(tbl, spark, _frame(spark, 10, 20), 1, branch="audit")
    # main readers see nothing from the branch
    assert tbl.current_snapshot_id() == main_before
    assert _ids(tbl.read(spark)) == list(range(10))
    # the branch head sees both waves
    assert _ids(tbl.read(spark, as_of=tbl.ref_head("audit"))) == \
        list(range(20))

    published = tbl.publish("audit")
    assert tbl.current_snapshot_id() == published
    assert _ids(tbl.read(spark)) == list(range(20))

    # a tag pins the published state while main keeps moving
    tbl.create_tag("v1")
    _commit(tbl, spark, _frame(spark, 20, 30), 2)
    assert _ids(tbl.read(spark)) == list(range(30))
    assert _ids(tbl.read(spark, as_of=tbl.ref_head("v1"))) == \
        list(range(20))

    # rollback is a pointer move to an ancestor; history stays readable
    tbl.rollback_to(published)
    assert _ids(tbl.read(spark)) == list(range(20))
    with pytest.raises(ValueError):
        tbl.rollback_to("0" * 16)            # unknown snapshot
    # non-ancestor target (the rolled-past head) is refused
    head_after = tbl.current_snapshot_id()
    _commit(tbl, spark, _frame(spark, 30, 40), 3)
    abandoned = [s["snapshot_id"] for s in tbl.snapshots()
                 if s["snapshot_id"] not in
                 {x["snapshot_id"] for x in tbl.snapshots(head_after)}]
    tbl.rollback_to(head_after)
    for sid in abandoned:
        with pytest.raises(ValueError):
            tbl.rollback_to(sid)


def test_publish_conflict_when_main_diverges(spark, tmp_path):
    tbl = IceTable(str(tmp_path / "t"))
    _commit(tbl, spark, _frame(spark, 0, 10), 0)
    tbl.create_branch("audit")
    _commit(tbl, spark, _frame(spark, 10, 20), 1, branch="audit")
    # main moves past the branch point before the publish
    _commit(tbl, spark, _frame(spark, 20, 30), 2)
    with pytest.raises(CommitConflict):
        tbl.publish("audit")
    # main's rows are untouched by the refused publish
    assert _ids(tbl.read(spark)) == list(range(10)) + list(range(20, 30))


def test_branch_commit_cas_and_tag_immutability(spark, tmp_path):
    tbl = IceTable(str(tmp_path / "t"))
    _commit(tbl, spark, _frame(spark, 0, 10), 0)
    tbl.create_branch("b")
    tbl.create_tag("t1")
    # expected_parent CAS applies per-branch, not against main
    b0 = tbl.ref_head("b")
    _commit(tbl, spark, _frame(spark, 10, 20), 1, branch="b",
            expected=b0)
    with pytest.raises(CommitConflict):
        _commit(tbl, spark, _frame(spark, 20, 30), 2, branch="b",
                expected=b0)                  # branch head moved
    # a tag never accepts commits, a missing ref never does either
    with pytest.raises(ValueError):
        _commit(tbl, spark, _frame(spark, 20, 30), 3, branch="t1")
    with pytest.raises(ValueError):
        _commit(tbl, spark, _frame(spark, 20, 30), 4, branch="nope")
    with pytest.raises(ValueError):
        tbl.create_branch("b")               # duplicate ref name
    with pytest.raises(ValueError):
        tbl.create_tag("main")               # reserved
    with pytest.raises(ValueError):
        tbl.publish("t1")                    # tags cannot publish
    with pytest.raises(ValueError):
        tbl.drop_ref("nope")


def test_expiry_pins_ref_history_until_dropped(spark, tmp_path):
    tbl = IceTable(str(tmp_path / "t"))
    for w in range(3):
        _commit(tbl, spark, _frame(spark, w * 10, w * 10 + 10), w)
    pinned_snap = tbl.current_snapshot_id()
    tbl.create_tag("release")                # pins the 3-wave state
    _commit(tbl, spark, _frame(spark, 30, 40), 3)
    tbl.compact(spark, target_file_bytes=64 << 20, committed_at="tc")

    out = tbl.expire_snapshots(keep=1)
    # the tag chain survives expiry: time travel to it still works
    assert _ids(tbl.read(spark, as_of=tbl.ref_head("release"))) == \
        list(range(30))
    assert _ids(tbl.read(spark, as_of=pinned_snap)) == list(range(30))

    # dropping the ref releases the lease; the next expiry (grace 0)
    # sweeps the now-unreachable history and its small files
    tbl.drop_ref("release")
    out2 = tbl.expire_snapshots(keep=1)
    assert out2["expired_snapshots"] >= 1
    with pytest.raises(FileNotFoundError):
        tbl._snapshot(pinned_snap)
    # main is unharmed
    assert _ids(tbl.read(spark)) == list(range(40))


def test_drop_branch_sweeps_offchain_snapshots_and_files(spark, tmp_path):
    tbl = IceTable(str(tmp_path / "t"))
    _commit(tbl, spark, _frame(spark, 0, 10), 0)
    tbl.create_branch("audit")
    _commit(tbl, spark, _frame(spark, 10, 20), 1, branch="audit")
    branch_snap = tbl.ref_head("audit")
    branch_files = [f for f in tbl.data_files(as_of=branch_snap)
                    if "w1" in f]
    assert branch_files and all(os.path.exists(f) for f in branch_files)

    # audit failed: drop the branch instead of publishing
    tbl.drop_ref("audit")
    # need a rewrite snapshot on main for expiry to have a safe cut
    _commit(tbl, spark, _frame(spark, 20, 30), 2)
    tbl.compact(spark, target_file_bytes=64 << 20, committed_at="tc")
    tbl.expire_snapshots(keep=1)
    with pytest.raises(FileNotFoundError):
        tbl._snapshot(branch_snap)           # snap file swept
    assert not any(os.path.exists(f) for f in branch_files)  # data GC'd
    assert _ids(tbl.read(spark)) == list(range(10)) + list(range(20, 30))


def test_metadata_tables(spark, tmp_path):
    """Iceberg-style metadata tables: .files / .snapshots / .history /
    .refs answer operational questions straight from the manifests."""
    tbl = IceTable(str(tmp_path / "t"))
    _commit(tbl, spark, _frame(spark, 0, 10), 0)
    _commit(tbl, spark, _frame(spark, 10, 20), 1)
    tbl.create_branch("audit")
    _commit(tbl, spark, _frame(spark, 20, 30), 2, branch="audit")
    tbl.create_tag("v1")

    files = tbl.files_df(spark).collect()
    assert len(files) == 2                       # main's live files
    assert all(r["size_bytes"] > 0 and r["snapshot_id"]
               for r in files)
    assert sorted(r["part_id"] for r in files) == [0, 1]

    snaps = tbl.snapshots_df(spark).collect()
    assert len(snaps) == 3                       # incl. branch commit
    assert sum(r["on_main"] for r in snaps) == 2
    assert all(r["n_files"] == 1 for r in snaps)

    hist = tbl.history_df(spark).orderBy("ordinal").collect()
    assert len(hist) == 2
    assert hist[0]["parent_id"] is None
    assert hist[1]["parent_id"] == hist[0]["snapshot_id"]
    assert hist[1]["snapshot_id"] == tbl.current_snapshot_id()

    refs = {r["name"]: (r["type"], r["snapshot_id"])
            for r in tbl.refs_df(spark).collect()}
    assert refs["main"] == ("branch", tbl.current_snapshot_id())
    assert refs["audit"] == ("branch", tbl.ref_head("audit"))
    assert refs["v1"] == ("tag", tbl.ref_head("v1"))

    # the files table is snapshot-addressable like every other read
    branch_files = tbl.files_df(spark,
                                as_of=tbl.ref_head("audit")).count()
    assert branch_files == 3
