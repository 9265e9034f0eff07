"""Structured Streaming surface: continuous ingest of page files.

The reference is queue/batch-based (SURVEY.md §2.6 — no stream
processing), so batch is this engine's primary mode; this module is the
continuous-ingest variant for a crawler that keeps appending page files
to the input table.  Per the design note in SURVEY.md §2.6 it reuses
the IDENTICAL batch stages via foreachBatch — zero operator changes:
each micro-batch flows through extracted_df() (same tiering, same
Arrow kernel, same byte-identity contract).

Exactly-once: the checkpoint directory tracks consumed input files;
foreachBatch output is idempotent per epoch_id (epoch subdirectory +
overwrite), the standard Structured Streaming sink recipe.

Also provides the classic streaming-analytics shape: watermarked
tumbling-window counts over warc_ts (late data beyond the watermark is
dropped).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from .options import ConvertOptions, DEFAULT_OPTIONS
from .pipeline import extracted_df

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def pages_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over the pages directory (new parquet files =
    new crawl output).  maxFilesPerTrigger bounds micro-batch size the
    way the reference bounds its queue (queue_max_size, settings.py:78)."""
    return (spark.readStream
            .schema(StructType.fromDDL(PAGES_DDL))
            .option("maxFilesPerTrigger", "64")
            .parquet(input_dir))


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str,
                   opt: ConvertOptions = DEFAULT_OPTIONS,
                   cpus: int = 8):
    """readStream → foreachBatch(batch extraction) → parquet epochs.

    Returns the started StreamingQuery (availableNow trigger: drains all
    pending files, then stops — the batch-job-over-a-stream shape).
    Rerunning after a crash resumes from the checkpoint: consumed files
    are never reprocessed, and an epoch directory that was half-written
    is overwritten idempotently.
    """

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = extracted_df(batch_df, opt, cpus=cpus)
        (out.write.mode("overwrite")
         .parquet(os.path.join(output_dir, f"epoch={epoch_id}")))

    return (pages_stream(spark, input_dir)
            .writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def windowed_lang_counts(pages: DataFrame, window: str = "1 minute",
                         watermark: str = "2 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation over crawl time: pages
    and bytes per (window, lang); rows later than the watermark are
    dropped (late-data policy).  Works on both the stream (append mode)
    and the equivalent batch frame (tests cross-check the two)."""
    return (pages
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("win"), "lang")
            .agg(F.count("*").alias("n_pages"),
                 F.sum(F.length("html")).alias("bytes_in"))
            .select(F.col("win.start").alias("win_start"), "lang",
                    "n_pages", "bytes_in"))


def stream_lang_counts(spark: SparkSession, input_dir: str,
                       checkpoint_dir: str, queryName: str = "lang_counts"):
    """Streaming variant of the windowed aggregation → in-memory sink
    (append mode: a window emits once its watermark passes)."""
    return (windowed_lang_counts(pages_stream(spark, input_dir))
            .writeStream
            .queryName(queryName)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .format("memory")
            .start())
