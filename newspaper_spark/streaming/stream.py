"""Structured Streaming wrapper around the extraction stage.

The reference is a batch/pull library (SURVEY.md §2.10) — every stage
is stateless per-row, so the streaming form is the identical dataflow
under ``readStream``: file-source over the transcripts table →
extract_articles → sink with checkpointLocation. No watermarks needed
(map-only); exactly-once comes from the sink checkpoint.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import extract_articles
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def extract_stream(transcripts: DataFrame) -> DataFrame:
    return extract_articles(transcripts)


def start_extraction_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """File-to-file streaming extraction with exactly-once checkpointing."""
    stream = read_transcript_stream(spark, input_dir)
    extracted = extract_stream(stream)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
