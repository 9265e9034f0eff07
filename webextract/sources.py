"""Source readers: the pages-table contract across storage schemes.

Operator S4 (SURVEY.md §2.1): the reference accepts http/file/S3
sources per document (docling_serve HTTP fetch + S3 coords); in a
Spark-native engine a *source* is a table location, and object-store
access is a FILESYSTEM CONFIG concern, not per-row code — the same
`spark.read.parquet(...)` serves `file://`, `hdfs://`, `s3a://`,
`gs://`, `abfss://` once the session carries the Hadoop FS settings
for the scheme.  This module gives that contract a surface:

* ``read_pages`` — scheme-agnostic reader that validates the
  input_hint column contract (url, warc_ts, html[, text, lang]) at
  plan time, so a wrong table fails fast with a clear error instead of
  an executor-side kernel exception mid-job.
* ``s3a_configs`` — the session config dict a deployment sets for S3
  (endpoint/credentials provider knobs), documented in one place.
  No credentials are ever stored here; values come from the caller or
  instance-profile providers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# input_hint (BASELINE.json): required / optional pages-table columns
REQUIRED_COLS = ("url", "warc_ts", "html")
OPTIONAL_COLS = ("text", "lang")


def read_pages(spark: SparkSession, path: str | list[str],
               fmt: str = "parquet") -> DataFrame:
    """Read a pages table from any Hadoop-FS scheme and validate the
    input_hint contract.  Column pruning still reaches the scan — the
    select below keeps only contract columns, so a wide table never
    ships extras into the kernel."""
    paths = [path] if isinstance(path, str) else list(path)
    df = spark.read.format(fmt).load(paths)
    missing = [c for c in REQUIRED_COLS if c not in df.columns]
    if missing:
        raise ValueError(
            f"pages table at {paths} is missing required columns "
            f"{missing}; input_hint requires (url string, warc_ts "
            f"timestamp, html binary)")
    keep = [c for c in REQUIRED_COLS + OPTIONAL_COLS if c in df.columns]
    return df.select(*keep)


def s3a_configs(endpoint: str | None = None,
                credentials_provider: str | None = None) -> dict[str, str]:
    """The spark-defaults/session entries an S3 deployment sets (the
    hadoop-aws jars must be on the cluster classpath — not bundled in
    this sandbox).  Returns a dict to feed ``builder.config(k, v)``.

    Credentials NEVER appear here: the default provider chain reads
    instance profiles / env; override ``credentials_provider`` to pin
    one (e.g. WebIdentityTokenCredentialsProvider on EKS)."""
    cfg = {
        # committers: directory committer avoids O(files) S3 renames on
        # the wave write — the same reason IceTable commits manifests
        "spark.hadoop.fs.s3a.committer.name": "directory",
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a":
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory",
        # scan behavior for heavy sequential parquet reads
        "spark.hadoop.fs.s3a.experimental.input.fadvise": "sequential",
        "spark.hadoop.fs.s3a.connection.maximum": "96",
    }
    if endpoint:
        cfg["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if credentials_provider:
        cfg["spark.hadoop.fs.s3a.aws.credentials.provider"] = \
            credentials_provider
    return cfg
