"""Driver-compare rehearsal: every queries() entry vs its DuckDB oracle.

Mirrors the driver's correctness gate (row count + schema-ish + exact
value compare after sorting columns by name) at sf=0.01, so any
engine-semantics mismatch (rounding, regex, division, ordering) fails
HERE before the real gate runs.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

# override to rehearse the whole sweep at another scale factor (the
# per-round verification runs it at sf0.1 = 10× the driver gate scale)
SF_DIR = os.environ.get("WEBEXTRACT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(rows, ncols):
    """Order-insensitive canonical form: stringified cells, sorted rows."""
    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        return str(v)

    return sorted(tuple(cell(v) for v in r) for r in rows)


QUERY_NAMES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert sdf.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    scols = sorted(sdf.columns)
    srows = [[r[c] for c in scols] for r in sdf.collect()]

    ores = ddb.sql(oracle)
    ocols_raw = ores.columns
    order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    ocols = [ocols_raw[i] for i in order]
    orows = [[r[i] for i in order] for r in ores.fetchall()]

    assert scols == ocols, f"{name}: column names {scols} != {ocols}"
    assert len(srows) == len(orows), \
        f"{name}: row count {len(srows)} != {len(orows)}"
    sc, oc = _canon(srows, len(scols)), _canon(orows, len(ocols))
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_synth_charset_json_safe(spark):
    """extract_json's oracle splices text into a JSON string literal
    with only backslash/quote escaping (mirroring json.dumps); control
    characters would make the two diverge.  Guard the assumption on
    the driver corpus — if this ever fails, extend the oracle's
    escaping instead of the generator."""
    texts = [r.text for r in spark.read.parquet(
        f"{SF_DIR}/documents.parquet").select("text").collect()]
    assert texts
    for t in texts:
        assert not any(ord(c) < 0x20 for c in t), repr(t[:80])
        # XML-splice oracles (jats/uspto/mets builders) additionally
        # assume no XML metacharacters in the corpus text
        assert not any(c in t for c in '<>&"'), repr(t[:80])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert df.filter("status = 'success'").count() == rows
