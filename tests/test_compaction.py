"""IceTable maintenance: compaction (rewrite_data_files) + snapshot
expiry.  The invariants: rows byte-identical through a rewrite, resume
part ids survive history expiry, time travel works until expiry, and
orphan GC never eats files that only historical snapshots reference."""

from __future__ import annotations

from webextract.icetable import IceTable
from webextract.pipeline import run_extract
from webextract.synth import pages_df


def _urls(df):
    return sorted(r["url"] for r in df.select("url").collect())


def test_compaction_roundtrip_and_expiry(spark, tmp_path):
    root = str(tmp_path / "tbl")
    pages = pages_df(spark, 300, parallelism=8)
    run_extract(spark, pages, root, partitions=8, waves=4, cpus=8)
    tbl = IceTable(root)
    before_rows = _urls(tbl.read(spark))
    before_files = tbl.data_files()
    pre_snap = tbl.current_snapshot_id()
    parts_before = tbl.committed_parts()
    assert len(before_files) >= 4   # wave-per-commit accretes files

    res = tbl.compact(spark, target_file_bytes=64 << 20,
                      committed_at="t-compact")
    assert res["snapshot_id"] and res["rewritten"] >= 2
    after_files = tbl.data_files()
    assert len(after_files) < len(before_files)
    assert _urls(tbl.read(spark)) == before_rows
    assert tbl.committed_parts() == parts_before
    # lineage skips the rewrite snapshot but keeps full history
    assert len(tbl.lineage()) == len(parts_before)

    # time travel: the pre-compaction snapshot still reads old files
    assert _urls(tbl.read(spark, as_of=pre_snap)) == before_rows
    # orphan GC must NOT reclaim them while their snapshots exist
    assert tbl.expire_orphans() == 0

    # history expiry reclaims exactly the rewritten small files
    out = tbl.expire_snapshots(keep=1)
    assert out["expired_snapshots"] >= 1
    assert out["removed_files"] == res["rewritten"]
    assert _urls(tbl.read(spark)) == before_rows
    # resume survives expiry via carried_parts on the rewrite snapshot
    assert tbl.committed_parts() == parts_before

    # a second compact is a no-op: everything is already at size
    res2 = tbl.compact(spark, target_file_bytes=64 << 20,
                       committed_at="t-compact-2")
    assert res2["rewritten"] == 0 and res2["snapshot_id"] is None


def test_incremental_read_changes(spark, tmp_path):
    """CDC surface: a consumer holding the last-seen snapshot id reads
    exactly the newer rows; crossing a rewrite raises instead of
    double-counting."""
    import pytest
    root = str(tmp_path / "tbl")
    pages = pages_df(spark, 200, parallelism=8)
    run_extract(spark, pages, root, partitions=4, waves=4, cpus=8)
    tbl = IceTable(root)
    chain = tbl.snapshots()          # newest first
    assert len(chain) == 4
    mid = chain[2]["snapshot_id"]    # after wave 2 of 4
    inc = tbl.read_changes(spark, since=mid)
    full = _urls(tbl.read(spark))
    upto_mid = _urls(tbl.read(spark, as_of=mid))
    assert sorted(set(full) - set(upto_mid)) == _urls(inc)
    # since=None reads everything; since=current reads nothing
    assert _urls(tbl.read_changes(spark, since=None)) == full
    assert tbl.read_changes(spark, tbl.current_snapshot_id()) is None
    # an unknown 'since' is an error, not an empty increment
    with pytest.raises(ValueError, match="not in the current chain"):
        tbl.changed_files("nonexistent-snap")
    # a rewrite inside the window invalidates the increment
    tbl.compact(spark, target_file_bytes=64 << 20, committed_at="t")
    with pytest.raises(ValueError, match="rewrite"):
        tbl.changed_files(mid)
