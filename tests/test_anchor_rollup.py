"""anchor_rollup unit tests: per-target aggregation semantics
(semantic/boiler split, deterministic representative anchor), the
composition with the real links_df kernel, and the two-level-agg plan
shape (no Expand-based distinct, no Window)."""

from __future__ import annotations

from webextract import corpus
from webextract.docpages import docs_to_pages
from webextract.pipeline import links_df


def _links(spark, rows):
    return spark.createDataFrame(
        rows, "url string, href string, anchor string, "
              "boiler boolean, semantic boolean")


def test_anchor_rollup_semantics(spark):
    """Counts, semantic subset, distinct-anchor count, and the
    lexicographically-least SEMANTIC anchor as the representative —
    NULL when a target only ever gets boilerplate inlinks."""
    rows = [
        # /t cited in-content from two pages under two names, plus a
        # nav farm hitting it with one repeated boiler anchor
        ("p1", "/t", "zebra guide", False, True),
        ("p2", "/t", "apple guide", False, True),
        ("p1", "/t", "home", True, False),
        ("p2", "/t", "home", True, False),
        ("p3", "/t", "home", True, False),
        # /nav-only: never semantic -> top_anchor NULL
        ("p1", "/nav-only", "footer", True, False),
        ("p2", "/nav-only", "footer", True, False),
        # same anchor string used BOTH ways on /mixed: one distinct
        # anchor, and it is still an admissible representative
        ("p1", "/mixed", "spec", True, False),
        ("p2", "/mixed", "spec", False, True),
    ]
    got = {r["href"]: r for r in
           corpus.anchor_rollup(_links(spark, rows)).collect()}

    t = got["/t"]
    assert (t["n_inlinks"], t["n_semantic"], t["n_anchors"]) == (5, 2, 3)
    assert t["top_anchor"] == "apple guide"   # least semantic anchor
    n = got["/nav-only"]
    assert (n["n_inlinks"], n["n_semantic"], n["n_anchors"]) == (2, 0, 1)
    assert n["top_anchor"] is None
    m = got["/mixed"]
    assert (m["n_inlinks"], m["n_semantic"], m["n_anchors"]) == (2, 1, 1)
    assert m["top_anchor"] == "spec"


def test_anchor_rollup_over_links_kernel(spark):
    """Composed with the real WAT pass: every doc carries the constant
    26-anchor boilerplate farm + 2 in-article citations, so shared nav
    hrefs aggregate across ALL docs with NULL representative and each
    per-doc citation href is a semantic singleton."""
    from webextract.queries import _read
    docs = _read(spark, "/root/testdata/sf0.001", "documents").limit(40)
    n_docs = docs.count()
    out = {r["href"]: r for r in corpus.anchor_rollup(
        links_df(docs_to_pages(docs, article_links=2))).collect()}
    # 10 shared boiler targets + 2 per-doc citation targets
    assert len(out) == 10 + 2 * n_docs
    l0 = out["/l0"]
    assert l0["n_inlinks"] == 3 * n_docs     # header + aside + footer
    assert l0["n_semantic"] == 0 and l0["top_anchor"] is None
    assert l0["n_anchors"] == 1              # one repeated anchor text
    acc = out["/accept"]
    assert (acc["n_inlinks"], acc["n_semantic"]) == (n_docs, 0)
    cite = [r for h, r in out.items() if "x1" in h]
    assert len(cite) == n_docs
    assert all(r["n_inlinks"] == 1 and r["n_semantic"] == 1
               and r["top_anchor"].startswith("ref ") for r in cite)


def test_anchor_rollup_plan_shape(spark):
    """Two-level aggregation: exactly two exchanges, and neither an
    Expand (the distinct-rewrite shape this op exists to avoid) nor a
    Window appears."""
    from tests.test_plans import _plan
    rows = [("p1", "/t", "a", False, True)]
    tree = _plan(corpus.anchor_rollup(
        _links(spark, rows))).split("\n\n")[0]
    assert tree.count("Exchange") == 2, tree
    assert "Expand" not in tree and "Window" not in tree
