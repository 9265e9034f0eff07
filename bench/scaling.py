"""Two-parallelism scaling protocol (BASELINE.md measurement protocol).

No real cluster exists in this sandbox, so the north_rule's N→4N
executor criterion is evidenced by running the identical extraction job
(same input parquet, same code, spark-submit --py-files) at local[8]
and local[32] and reporting throughput at both plus
efficiency = (thr_32 / thr_8) / 4.  Results go to BENCH.md.

Usage: python bench/scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd: list[str]) -> str:
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise SystemExit(f"command failed: {' '.join(cmd)}")
    return r.stdout


def ensure_pages(n: int) -> str:
    path = f"/tmp/webextract_bench/pages_scaling_n{n}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        gen = (
            "from webextract.session import get_spark\n"
            "from webextract.synth import pages_df\n"
            "sp = get_spark('wx-gen', cpus=32)\n"
            f"pages_df(sp, {n}, parallelism=64).write.mode('overwrite')"
            f".parquet('{path}')\n"
            "sp.stop()\n")
        subprocess.run([sys.executable, "-c", gen], cwd=REPO, check=True,
                       capture_output=True)
    return path


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    pages = ensure_pages(n)
    pkg = "/tmp/webextract_pkg.zip"
    subprocess.run(["zip", "-qr", pkg, "webextract"], cwd=REPO, check=True)

    results = {}
    for cpus in (8, 32):
        out = sh(["spark-submit", "--master", f"local[{cpus}]",
                  "--py-files", pkg,
                  os.path.join(REPO, "bench", "scaling_job.py"),
                  pages, str(cpus)])
        results[cpus] = json.loads(out.strip().splitlines()[-1])
        print(results[cpus])

    thr8, thr32 = (results[8]["docs_per_sec"], results[32]["docs_per_sec"])
    eff = round((thr32 / thr8) / 4, 3)
    summary = {"n_docs": n, "local8": results[8], "local32": results[32],
               "speedup_8_to_32": round(thr32 / thr8, 2),
               "scaling_efficiency": eff, "pass": eff >= 0.8}
    print(json.dumps(summary))

    md = f"""# BENCH — scaling evidence (N → 4N parallelism)

Protocol (BASELINE.md): identical extraction job — same input parquet
({n} deterministic synthetic pages, seed 42, heavy-tailed sizes + skew
bombs), same code, `spark-submit --py-files` — at `local[8]` and
`local[32]`; timing is the extraction stage only (scan → tiered
repartition → mapInArrow kernel → noop sink), best of 2 after a warm
pass.

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[8]  (N)  | {results[8]['wall_s']} | {results[8]['docs_per_sec']} |
| local[32] (4N) | {results[32]['wall_s']} | {results[32]['docs_per_sec']} |

- speedup 8→32: **{summary['speedup_8_to_32']}×**
- scaling efficiency = (thr₃₂/thr₈)/4 = **{eff}** — target ≥ 0.8: **{'PASS' if eff >= 0.8 else 'FAIL'}**
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
