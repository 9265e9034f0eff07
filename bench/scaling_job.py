"""Timed extraction job for the scaling protocol (run via spark-submit).

Reads a pre-generated page corpus, runs the extraction pipeline to a
noop sink, and prints one JSON line with the extraction wall time only
(session startup and scan-side cache warmup excluded via one warm
pass).  Used by bench/scaling.py at two masters (local[8], local[32])
to evidence the north_rule's N→4N scaling-efficiency criterion.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    pages_path, cpus = sys.argv[1], int(sys.argv[2])
    spark = (SparkSession.builder.appName(f"wx-scale-{cpus}")
             .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from webextract.pipeline import extracted_df

    pages = spark.read.parquet(pages_path)
    n = pages.count()

    def run() -> float:
        t0 = time.time()
        (extracted_df(pages, cpus=cpus)
         .write.format("noop").mode("overwrite").save())
        return time.time() - t0

    run()                      # warm: JVM codegen + Python workers
    wall = min(run(), run())   # best of 2 timed passes
    print(json.dumps({"cpus": cpus, "n_docs": n, "wall_s": round(wall, 3),
                      "docs_per_sec": round(n / wall, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
