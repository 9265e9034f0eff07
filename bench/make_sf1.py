"""Build the sf1 probe corpus: a deterministic 10x blowup of the
sf0.1 documents/embeddings tables (round-4 verdict item 8 — the
dedup/ANN caps and thresholds get one order-of-magnitude-larger
oracle run than the round-close sf0.1 rehearsal).

Construction (pure SQL over the driver's sf0.1 parquet, seedless):

* documents: 10 replicas; replica r's doc_id = r*5000 + doc_id.
  Replica 0 is the original; replicas r>0 suffix EVERY token with
  ``~r`` so cross-replica shingle overlap is zero — in-replica
  near-dup structure is preserved exactly while distinct-shingle
  cardinality grows 10x (the thing the df/bucket caps see).
* embeddings: 10 replicas; vec_id = r*2000 + vec_id; components get
  a replica-dependent deterministic offset so no two replicas carry
  identical vectors (IVF/PQ centroids train on the 256 smallest ids,
  which stay the originals).

Usage: python bench/make_sf1.py [out_dir]   (default /tmp/wx_sf1)
Then:  WEBEXTRACT_ORACLE_SF=<out_dir> python -m pytest \
           tests/test_queries_oracle.py -q -k "<dedup/ann gates>"
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
PASSTHROUGH = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events")


def main(out: str = "/tmp/wx_sf1") -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
        COPY (
          SELECT r.r * 5000 + d.doc_id AS doc_id,
                 CASE WHEN r.r = 0 THEN d.text
                      ELSE array_to_string(
                        list_transform(string_split(d.text, ' '),
                                       t -> t || '~' || r.r), ' ')
                 END AS text,
                 d.lang, d.source,
                 length(CASE WHEN r.r = 0 THEN d.text
                        ELSE array_to_string(
                          list_transform(string_split(d.text, ' '),
                                         t -> t || '~' || r.r), ' ')
                        END)::BIGINT AS n_chars
          FROM '{SRC}/documents.parquet' d,
               (SELECT unnest(generate_series(0, 9)) AS r) r
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT parquet)""")
    con.sql(f"""
        COPY (
          SELECT r.r * 2000 + e.vec_id AS vec_id,
                 CASE WHEN r.r = 0 THEN e.embedding
                      ELSE list_transform(
                        e.embedding,
                        x -> (x + 0.0037 * r.r)::FLOAT)
                 END AS embedding,
                 e.label
          FROM '{SRC}/embeddings.parquet' e,
               (SELECT unnest(generate_series(0, 9)) AS r) r
          ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT parquet)""")
    for t in PASSTHROUGH:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    n_d = con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'") \
        .fetchone()[0]
    n_e = con.sql(f"SELECT count(*) FROM '{out}/embeddings.parquet'") \
        .fetchone()[0]
    print(f"sf1 probe at {out}: documents={n_d} embeddings={n_e}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/wx_sf1")
