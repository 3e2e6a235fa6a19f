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


def sessionized_cell_activity(assigned_stream: DataFrame,
                              gap: str = "30 minutes",
                              watermark: str = "60 minutes") -> DataFrame:
    """Custom stateful streaming operator: per-cell ACTIVITY SESSIONS via
    applyInPandasWithState — a crawl burst on one spatial cell opens a
    session that stays alive while records keep arriving within `gap`,
    then emits (cell_id, session_start, session_end, docs) on timeout.

    This is the applyInPandasWithState shape the engine uses for any
    operator windowed aggregation can't express (session windows keyed by
    spatial cell); state is one (start, last_ts, count) triple per cell.
    Event-time timeout: a session closes deterministically when the
    WATERMARK passes last_ts + gap (no wall-clock dependence — replayable).
    """
    import datetime as dt

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_sec = {"minutes": 60, "minute": 60, "hours": 3600, "hour": 3600,
               "seconds": 1, "second": 1}
    num, unit = gap.split()
    gap_ms = int(float(num) * gap_sec[unit] * 1000)

    out_schema = ("cell_id long, session_start timestamp, "
                  "session_end timestamp, docs long")
    state_schema = "start long, last long, docs long"

    def update(key, pdfs, state):
        if state.hasTimedOut:
            start, last, docs = state.get
            state.remove()
            yield pd.DataFrame({
                "cell_id": [key[0]],
                "session_start": [dt.datetime.utcfromtimestamp(start / 1000)],
                "session_end": [dt.datetime.utcfromtimestamp(last / 1000)],
                "docs": [docs]})
            return
        ts_min = None
        ts_max = None
        n = 0
        for pdf in pdfs:
            col = pd.to_datetime(pdf["warc_ts"])
            ts_min = col.min() if ts_min is None else min(ts_min, col.min())
            ts_max = col.max() if ts_max is None else max(ts_max, col.max())
            n += len(pdf)
        lo = int(ts_min.value // 10**6)
        hi = int(ts_max.value // 10**6)
        if state.exists:
            start, last, docs = state.get
            start, last, docs = min(start, lo), max(last, hi), docs + n
        else:
            start, last, docs = lo, hi, n
        state.update((start, last, docs))
        state.setTimeoutTimestamp(last + gap_ms)
        return iter(())

    return (assigned_stream
            .withWatermark("warc_ts", watermark)
            .groupBy("cell_id")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))


def windowed_raster_stream(assigned_stream: DataFrame,
                           footprint_deg: float = 1.0,
                           cell_size: float = 0.25,
                           window: str = "10 minutes",
                           watermark: str = "30 minutes") -> DataFrame:
    """Streaming vector->raster rollup: each page's footprint rasterizes
    statelessly via the SAME explode_rect_cells the batch rasterizer uses
    (streaming-safe, no state — any change to the coverage rule applies
    to both paths), then a watermarked tumbling window sums per-cell doc
    weight. The continuous version of the batch pyramid's level-0 build."""
    from py3dtiles_spark.operators.raster import explode_rect_cells
    half = footprint_deg / 2.0
    rects = (assigned_stream
             .withColumn("x0", F.col("x") - half)
             .withColumn("x1", F.col("x") + half)
             .withColumn("y0", F.col("y") - half)
             .withColumn("y1", F.col("y") + half))
    cells = explode_rect_cells(rects, cell_size)
    return (cells
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"),
                     "cell_x", "cell_y")
            .agg(F.count(F.lit(1)).alias("docs"))
            .select(F.col("w.start").alias("window_start"),
                    "cell_x", "cell_y", "docs"))


def dedup_stream(pages_stream: DataFrame, key_cols=("url",),
                 ts_col: str = "warc_ts",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup of a crawl: keep the FIRST record per key
    (url or content fingerprint) across micro-batches, with state bounded
    by the watermark — `dropDuplicatesWithinWatermark` drops every
    duplicate whose event time lands within the watermark window of the
    kept record, then expires the key's state, so a re-crawl loop's
    within-horizon repeats vanish while state stays finite (the unbounded
    dropDuplicates variant would grow state forever on an endless crawl).

    Re-crawls farther apart than the watermark are KEPT (a page fetched
    again a week later is a legitimate new snapshot); pair with the batch
    exact_dedup/minhash path for whole-corpus offline dedup.

    Use `F.xxhash64("text")` (or text.fingerprint) as a key column for
    content-level dedup instead of url-level."""
    return (pages_stream
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(key_cols)))


def curate_stream(pages_stream: DataFrame, eval_docs: DataFrame,
                  shingle_tokens: int = 8, min_tokens: int = 10,
                  ts_col: str = "warc_ts",
                  watermark: str = "1 hour",
                  max_eval_hashes: int = 100_000) -> DataFrame:
    """Streaming crawl curation — the online half of the `curate` CLI,
    composed from stream-legal pieces only:

    1. stateless quality gate (token floor) — per-record exprs;
    2. content-level exact dedup within the watermark horizon
       (md5-of-text key through `dedup_stream`, state bounded);
    3. eval-set decontamination as a PER-RECORD membership check: the
       static eval side's distinct shingle hashes resolve ONCE at plan
       time (eval sets are benchmark-suite-sized — thousands of docs —
       never corpus-sized) and ship as one literal array, so the check
       is a stateless `arrays_overlap` with zero stream state. A
       corpus-sized blocklist would instead use the supported
       stream-static left_anti join on exploded shingles plus a
       watermarked per-doc re-aggregation.

    Emits the kept records with their token counts — append mode, so it
    chains into any downstream sink/aggregation.
    """
    from py3dtiles_spark.functions.text import (
        _shingle_hashes, token_count, tokens)

    gated = (pages_stream
             .withColumn("n_tokens", token_count().cast("long"))
             .filter(F.col("n_tokens") >= min_tokens)
             .withColumn("_th", F.md5(F.encode("text", "UTF-8"))))
    deduped = dedup_stream(gated, key_cols=("_th",), ts_col=ts_col,
                           watermark=watermark)
    etoks = F.filter(tokens("text"), lambda t: t != F.lit(""))
    eval_hashes = [r.h for r in eval_docs.select(
        F.explode(_shingle_hashes(etoks, shingle_tokens)).alias("h"))
        .distinct().collect()]
    # ADVICE r6: the literal-array membership check is O(doc_windows x
    # eval_hashes) per record and the array ships inside the plan to
    # every task — enforce the documented eval-set-sized bound instead
    # of trusting callers to read the docstring; corpus-sized blocklists
    # must use the stream-static left_anti join path described above
    if len(eval_hashes) > max_eval_hashes:
        raise ValueError(
            f"{len(eval_hashes)} distinct eval shingle hashes exceeds "
            f"max_eval_hashes={max_eval_hashes}: the per-record literal-"
            "array membership check is meant for benchmark-suite-sized "
            "eval sets. For corpus-sized blocklists use a stream-static "
            "left_anti join on exploded shingles plus a watermarked "
            "per-doc re-aggregation (see docstring), or raise "
            "max_eval_hashes explicitly if the plan-size cost is "
            "acceptable.")
    doc_toks = F.filter(tokens("text"), lambda t: t != F.lit(""))
    clean = deduped.filter(~F.arrays_overlap(
        _shingle_hashes(doc_toks, shingle_tokens),
        F.lit(eval_hashes).cast("array<string>")))
    return clean.select("url", ts_col, "lang", "n_tokens")


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
