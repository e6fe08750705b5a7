"""Kafka streaming source — reference S4 (`03_Bronze-to-Silver ETL.py:
246-262`): SASL_SSL IoT-Hub-style endpoint, latest offsets, lossy-broker
tolerance, per-trigger throttle, 60 s broker timeouts.

The API is stock Structured Streaming; the kafka connector jar is not in
this image, so construction is attempted lazily and callers should treat
failure as "no Kafka in this environment" (tests use
:func:`pos_dlt_spark.sources.files.json_file_stream` as the drop-in
double — same payload schema, same downstream plan).

Because the connector can never execute here, the CONTRACT is the option
set itself: :func:`kafka_options` is the single source of truth for every
option the reference notebook configures, and `tests/test_sources.py`
pins it option-for-option against `03:246-262` so a drift (dropped
timeout, renamed key, wrong literal format) fails CI even without a
broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int = 100,
    fail_on_data_loss: bool = False,
    sasl_jaas: str | None = None,
    request_timeout_ms: int = 60000,
    session_timeout_ms: int = 60000,
) -> dict[str, str]:
    """The full reader option set, mirroring reference `03:246-262`
    one-for-one: subscribe, bootstrap servers, SASL_SSL/PLAIN auth (when
    a JAAS config is given), 60 s request/session timeouts, lossy-broker
    tolerance (`failOnDataLoss=false`), latest offsets, and the
    100-offsets-per-trigger throttle (reference W4)."""
    opts = {
        "subscribe": topic,
        "kafka.bootstrap.servers": bootstrap_servers,
        "kafka.request.timeout.ms": str(request_timeout_ms),
        "kafka.session.timeout.ms": str(session_timeout_ms),
        "failOnDataLoss": str(fail_on_data_loss).lower(),
        "startingOffsets": starting_offsets,
        "maxOffsetsPerTrigger": str(max_offsets_per_trigger),
    }
    if sasl_jaas:
        opts["kafka.sasl.mechanism"] = "PLAIN"
        opts["kafka.security.protocol"] = "SASL_SSL"
        opts["kafka.sasl.jaas.config"] = sasl_jaas
    return opts


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
    return (
        spark.readStream.format("kafka")
        .options(
            **kafka_options(
                bootstrap_servers,
                topic,
                starting_offsets,
                max_offsets_per_trigger,
                fail_on_data_loss,
                sasl_jaas,
            )
        )
        .load()
    )
