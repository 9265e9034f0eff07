"""Batched-inference stage slot: HTTP micro-batch operator vs the
deterministic mock endpoint (retry, timeout, concurrency, options
wiring).  The oracle gate (picture_describe_api) covers the full
corpus round-trip; these tests cover the failure modes."""

from __future__ import annotations

from webextract.infer import (describe_from_features, picture_describe,
                              picture_descriptions_for,
                              start_mock_describer)
from webextract.media import with_bmp_media


def _docs(spark, n=40):
    return with_bmp_media(spark.range(0, n).withColumnRenamed("id", "doc_id"))


def test_local_engine_matches_http(spark):
    docs = _docs(spark)
    local = {r.doc_id: r for r in picture_describe(docs).collect()}
    endpoint, srv = start_mock_describer()
    try:
        http = {r.doc_id: r
                for r in picture_describe(docs, endpoint=endpoint,
                                          batch_size=8).collect()}
    finally:
        srv.shutdown()
    assert len(local) == len(http) == 40
    for did, r in local.items():
        assert http[did] == r
        assert r.description == describe_from_features(r.label, r.n_px)


def test_retries_recover_from_transient_500(spark):
    docs = _docs(spark, 10)
    endpoint, srv = start_mock_describer(fail_first=2)
    try:
        # one partition + batch_size>=10 -> a single POST, retried past
        # the two injected 500s
        rows = picture_describe(docs.coalesce(1), endpoint=endpoint,
                                batch_size=64, retries=3).collect()
    finally:
        srv.shutdown()
    assert len(rows) == 10
    assert all(r.description is not None for r in rows)
    assert srv.mock_state["n_requests"] >= 3   # 2 failures + 1 success


def test_timeout_exhausts_to_null_not_crash(spark):
    docs = _docs(spark, 6)
    endpoint, srv = start_mock_describer(delay_s=1.5)
    try:
        rows = picture_describe(docs.coalesce(1), endpoint=endpoint,
                                batch_size=64, timeout_s=0.2,
                                retries=1).collect()
    finally:
        srv.shutdown()
    # abort_on_error=false semantics: rows survive, description is null
    assert len(rows) == 6
    assert all(r.description is None for r in rows)
    assert all(r.label is not None for r in rows)   # features still real


def test_concurrency_knob_bounds_in_flight(spark):
    docs = _docs(spark, 64)
    endpoint, srv = start_mock_describer(delay_s=0.05)
    try:
        rows = picture_describe(docs.coalesce(1), endpoint=endpoint,
                                batch_size=4, concurrency=4).collect()
    finally:
        srv.shutdown()
    assert len(rows) == 64
    assert srv.mock_state["n_requests"] == 16          # 64 / 4 per batch
    assert 1 <= srv.mock_state["max_in_flight"] <= 4   # knob respected


def test_options_wiring(spark):
    import pytest
    from webextract.options import DEFAULT_OPTIONS
    docs = _docs(spark, 5)
    with pytest.raises(ValueError):
        picture_descriptions_for(docs, DEFAULT_OPTIONS)
    endpoint, srv = start_mock_describer()
    try:
        opt = DEFAULT_OPTIONS.with_(do_picture_description=True,
                                    picture_description_api=endpoint)
        rows = picture_descriptions_for(docs, opt).collect()
        assert all(r.description is not None for r in rows)
        # local slot: no endpoint configured -> deterministic engine
        opt2 = DEFAULT_OPTIONS.with_(do_picture_description=True)
        rows2 = picture_descriptions_for(docs, opt2).collect()
        assert sorted(r.description for r in rows2) == \
            sorted(r.description for r in rows)
    finally:
        srv.shutdown()
