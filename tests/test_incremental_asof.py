"""Unit + plan tests for the round-4 late gates: incremental snapshot
dedup (new-vs-committed asymmetric MinHash) and the as-of attribution
join (union + running window, zero joins)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from webextract.corpus import incremental_dedup

SF = "/root/testdata/sf0.01"

BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "green bottles hang quietly on the old stone wall near the "
        "river bend waiting for the evening train to pass")
OTHER = ("completely different content about spark physical plans and "
         "shuffle exchanges that shares no shingles with the base text "
         "at all because every token here is from another domain")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_semantics(spark):
    old = _docs(spark, [(1, BASE), (2, BASE), (3, OTHER)])
    new = _docs(spark, [
        (101, BASE),                 # exact dup of old 1 and 2
        (102, "utterly novel words never seen before in any committed "
              "document anywhere with many unique tokens to shingle"),
        (104, "shared boilerplate tail " + BASE),  # near-dup of old 1/2
        (105, "shared boilerplate tail " + BASE),  # in-batch dup of 104
    ])
    got = {r["doc_id"]: (r["dup_of"], r["jaccard"])
           for r in incremental_dedup(old, new).collect()}
    # dup_of picks the SMALLEST committed id; exact dup scores 1.0
    assert got[101] == (1, 1.0)
    # novel doc emits no row
    assert 102 not in got
    # near-dup still attributed to the committed corpus
    assert got[104][0] == 1 and got[104][1] >= 0.4
    # in-batch duplicates (104~105) are NOT each other's dup_of — both
    # match only committed docs (lsh_jaccard_pairs owns in-batch pairs)
    assert got[105][0] == 1


def test_incremental_candidates_plan_shape(spark):
    """The candidate stage is where the scaling claim lives, and it is
    checkpoint-truncated out of incremental_dedup's final plan — so pin
    it on incremental_candidates directly (the r4 review's fix for the
    vacuous assertion): committed band keys flow staged-scan →
    broadcast anti (hot buckets) → broadcast inner (new side) with the
    per-new-doc aggregate as the ONLY hash exchange; nothing
    sort-merges."""
    import re
    from tests.test_plans import _plan
    from webextract.corpus import incremental_candidates
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 4)
    old = docs.filter(F.col("doc_id") % 5 != 4)
    plan = _plan(incremental_candidates(old, new))
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]          # hot-bucket guard
    # committed rows enter NO hash exchange: the only one is the
    # (new_id) candidate aggregate (formatted explain prints the
    # partitioning in the node's Arguments detail)
    assert len(re.findall(r"hashpartitioning\(new_id", plan)) == 1, \
        plan[:3000]
    assert len(re.findall(r"hashpartitioning\(old_id", plan)) == 0, \
        plan[:3000]


def test_incremental_dedup_broadcast_fallback(spark):
    """Above the size gate the new-side band join and the verify joins
    fall back to shuffle-hash; nothing sort-merges in either stage."""
    from tests.test_plans import _plan
    from webextract.corpus import incremental_candidates
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 4)
    old = docs.filter(F.col("doc_id") % 5 != 4)
    cand_plan = _plan(incremental_candidates(old, new, broadcast_cap=1))
    assert "SortMergeJoin" not in cand_plan, cand_plan[:2000]
    assert "ShuffledHashJoin Inner" in cand_plan, cand_plan[:2000]
    full_plan = _plan(incremental_dedup(old, new, broadcast_cap=1))
    assert "SortMergeJoin" not in full_plan, full_plan[:2000]
    assert "ShuffledHashJoin" in full_plan, full_plan[:2000]


def _events(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    data = [(eid, base + datetime.timedelta(seconds=s), uid, et, 1.0, "{}")
            for (eid, s, uid, et) in rows]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")


def test_events_asof_semantics(spark, tmp_path):
    ev = _events(spark, [
        (1, 10, 1, "click"),
        (2, 10, 1, "click"),      # same ts as e1: tie -> higher id
        (3, 10, 1, "purchase"),   # equal-ts click IS visible
        (4, 5, 2, "purchase"),    # no prior click -> null attribution
        (5, 20, 1, "purchase"),   # latest click still e2
        (6, 15, 1, "view"),       # other types never attribute
    ])
    ev.write.parquet(str(tmp_path / "events.parquet"))
    from webextract.queries import q_events_asof
    got = {r["event_id"]: (r["click_id"], r["gap_us"])
           for r in q_events_asof(spark, str(tmp_path)).collect()}
    assert got[3] == (2, 0)
    assert got[4] == (None, None)
    assert got[5] == (2, 10_000_000)
    assert set(got) == {3, 4, 5}


def test_incremental_admission_consumes_band_key_artifact(spark):
    """Round-4 verdict item 6: with the committed band-key artifact
    supplied, the candidate stage is STRUCTURALLY incapable of
    re-shingling the committed corpus (old=None — no committed-docs
    frame exists in that plan at all), and both the candidate set and
    the full admission verdict equal the recompute path."""
    import pytest
    from webextract.corpus import incremental_candidates, lsh_band_keys
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 4)
    old = docs.filter(F.col("doc_id") % 5 != 4)
    art = lsh_band_keys(old).localCheckpoint()

    got = incremental_candidates(None, new, old_band_keys=art)
    want = incremental_candidates(old, new)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))

    via = incremental_dedup(old, new, old_band_keys=art)
    base = incremental_dedup(old, new)
    assert sorted(map(tuple, via.collect())) == \
        sorted(map(tuple, base.collect()))

    with pytest.raises(ValueError):
        incremental_candidates(None, new)   # no docs AND no artifact
