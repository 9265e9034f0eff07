"""spark-submit entry point for the extraction job.

Packaging contract (north_rule): ``spark-submit --py-files pkg.zip -m``
on a multi-executor cluster.  The arg surface mirrors the reference's
option record (ConvertDocumentsRequestOptions fields we honor,
/root/reference/docling_serve/datamodel/convert.py:20-40) the way its
FormDepends maps pydantic fields to CLI-ish form fields
(/root/reference/docling_serve/helper_functions.py:46-115).

Usage:
    spark-submit --py-files /tmp/pkg.zip -m webextract.cli \\
        --input /path/pages_parquet --output /path/ice_table \\
        --partitions 256 --waves 8 [--synth N] [--to-formats md,text]

Either --input (a parquet dir with the input_hint schema) or --synth N
(generate N deterministic pages executor-side) must be given.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="webextract")
    p.add_argument("--input", help="parquet dir of pages (url, warc_ts, html, text, lang)")
    p.add_argument("--synth", type=int, default=0,
                   help="generate N synthetic pages instead of --input")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", required=True, help="IceTable root dir")
    p.add_argument("--partitions", type=int, default=64)
    p.add_argument("--waves", type=int, default=4)
    p.add_argument("--cpus", type=int, default=32,
                   help="parallelism hint for tier repartitions")
    p.add_argument("--run-id", default=None)
    p.add_argument("--to-formats", default="md,text")
    p.add_argument("--from-formats", default="html,pdf")
    p.add_argument("--max-file-size", type=int, default=256 * 1024 * 1024)
    p.add_argument("--fail-after-wave", type=int, default=None,
                   help="inject a crash after wave K (resume testing)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.input and not args.synth:
        print("one of --input / --synth required", file=sys.stderr)
        return 2

    from webextract.options import ConvertOptions
    from webextract.pipeline import run_extract
    from webextract.synth import pages_df

    spark = (SparkSession.builder.appName("webextract")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    opt = ConvertOptions(
        from_formats=tuple(args.from_formats.split(",")),
        to_formats=tuple(args.to_formats.split(",")),
        max_file_size=args.max_file_size)
    pages = (spark.read.parquet(args.input) if args.input
             else pages_df(spark, args.synth, seed=args.seed))
    summary = run_extract(
        spark, pages, args.output, opt=opt, partitions=args.partitions,
        waves=args.waves, cpus=args.cpus, run_id=args.run_id,
        fail_after_wave=args.fail_after_wave)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
