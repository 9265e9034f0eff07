"""Targeted per-query measurement harness for optimization work
(guide §1.4: noop-sink isolation; §1.5: labeled jobs).

NOT the graded bench — bench.py is frozen for measurement.  This tool
times a subset of registry queries with the same protocol as bench.py
(build + noop force inside the timer, min over passes after a warm
pass) and can dump .explain("formatted") plans.

Usage:
    python bench_extra.py [--plans DIR --tag before] name1 name2 ...
Env:
    SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0)
    SPARK_GRAFT_CPUS   (default 32)
    BX_PASSES          timed passes per query (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    tag = "plan"
    while args and args[0].startswith("--"):
        if args[0] == "--plans":
            plans_dir = args[1]
            args = args[2:]
        elif args[0] == "--tag":
            tag = args[1]
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    passes = int(os.environ.get("BX_PASSES", "2"))

    from webextract.queries import QUERIES
    from webextract.session import get_spark

    spark = get_spark("bench-extra", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, float] = {}
    for name in names:
        q = QUERIES[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"bx:{name}")
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = q(spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"),
                      "w") as f:
                f.write(txt)
        if passes <= 0:                   # plans-only mode
            print(f"{name}: plan captured", flush=True)
            continue
        _force(q(spark, sf_dir))          # warm
        walls = []
        for _ in range(passes):
            t0 = time.time()
            _force(q(spark, sf_dir))
            walls.append(time.time() - t0)
        out[name] = round(min(walls), 3)
        print(f"{name}: {out[name]}  (all: "
              f"{[round(w, 3) for w in walls]})", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
