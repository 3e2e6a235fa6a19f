"""Structured Streaming ingest: pages stream -> cell assignment -> windowed
rollups.

The reference is an incremental-batch pipeline with no streaming semantics
(SURVEY.md §2.9); this module is the Spark-native extension for continuous
crawl ingest: stateless geocode + cell encode per micro-batch, then a
watermarked tumbling-window aggregation of docs-per-cell (late WARC records
tolerated up to the watermark), checkpointed for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from py3dtiles_spark.operators.spatial_join import point_cell_id
from py3dtiles_spark.sources.pages import geocode


def stream_pages_from_files(spark: SparkSession, path: str,
                            schema: str = "url string, warc_ts timestamp, "
                                          "html binary, text string, "
                                          "lang string") -> DataFrame:
    """File-source stream of page parquet drops (each new file = one
    micro-batch of crawl output)."""
    return spark.readStream.schema(schema).parquet(path)


def cell_assignments_stream(pages_stream: DataFrame,
                            cell_deg: float = 5.0) -> DataFrame:
    """Stateless per-record enrichment: geocode + coarse cell id."""
    return (geocode(pages_stream)
            .withColumn("cell_id", point_cell_id(cell_deg))
            .select("url", "warc_ts", "lang", "x", "y", "z", "cell_id"))


def windowed_cell_counts(assigned_stream: DataFrame,
                         window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window docs-per-cell rollup (late data within
    the watermark still lands in its window)."""
    return (assigned_stream
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), "cell_id")
            .agg(F.count("*").alias("docs"),
                 F.approx_count_distinct("lang").alias("langs"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "cell_id", "docs", "langs"))


def run_stream_to_memory(spark: SparkSession, src_path: str,
                         query_name: str = "cell_counts",
                         cell_deg: float = 5.0) -> "DataFrame":
    """Drive the stream with Trigger.AvailableNow (process all files, then
    stop) into an in-memory sink; returns the result table."""
    stream = stream_pages_from_files(spark, src_path)
    counts = windowed_cell_counts(cell_assignments_stream(stream, cell_deg))
    q = (counts.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)
