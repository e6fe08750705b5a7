"""Kafka streaming source — reference S4 (`03_Bronze-to-Silver ETL.py:
246-262`): SASL_SSL IoT-Hub-style endpoint, latest offsets, lossy-broker
tolerance, per-trigger throttle.

The API is stock Structured Streaming; the kafka connector jar is not in
this image, so construction is attempted lazily and callers should treat
failure as "no Kafka in this environment" (tests use
:func:`pos_dlt_spark.sources.files.json_file_stream` as the drop-in
double — same payload schema, same downstream plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int = 100,
    fail_on_data_loss: bool = False,
    sasl_jaas: str | None = None,
) -> DataFrame:
    """Subscribe to a topic; returns the standard Kafka envelope
    (key/value binary, topic, partition, offset, timestamp...)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if sasl_jaas:
        reader = (
            reader.option("kafka.security.protocol", "SASL_SSL")
            .option("kafka.sasl.mechanism", "PLAIN")
            .option("kafka.sasl.jaas.config", sasl_jaas)
        )
    return reader.load()
