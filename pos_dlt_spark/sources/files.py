"""File-based streaming sources — the OSS equivalent of Databricks Auto
Loader (`cloudFiles`, reference `03_Bronze-to-Silver ETL.py:354-364`) and a
file-drop stand-in for the Kafka source (`03:246-262`).

Spark's file source tracks seen files in the checkpoint and delivers each
new file exactly once — the same semantics `cloudFiles` with
``includeExistingFiles=true`` provides. ``maxFilesPerTrigger`` is the
file-source form of the reference's ``maxOffsetsPerTrigger`` throttle
(`03:260`).

Scale note: directory listing is O(files); on object storage at 100 TB the
listing itself becomes the bottleneck — keep landing dirs partitioned by
date (``.../dt=2021-01-01/``) and point one stream per active partition, or
move to a notification-based source. The API below stays identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from pos_dlt_spark.schemas import TIMESTAMP_FORMAT


def csv_file_stream(
    spark: SparkSession,
    directory: str,
    schema: StructType,
    header: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Auto-Loader-equivalent incremental CSV ingest (reference S5)."""
    reader = (
        spark.readStream.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("timestampFormat", TIMESTAMP_FORMAT)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(directory)


def json_file_stream(
    spark: SparkSession,
    directory: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """JSON-lines file stream — the engine's test double for the Kafka
    event feed: each file is a batch of `value` payloads."""
    reader = spark.readStream.format("json").schema(schema).option(
        "timestampFormat", TIMESTAMP_FORMAT
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(directory)
