"""Source contract tests. The Kafka connector jar is not in this image, so
the S4 source can never execute here — the enforceable contract is the
option set, pinned one-for-one against reference `03_Bronze-to-Silver
ETL.py:246-262` (the documented waiver for integration coverage)."""

import pytest

from pos_dlt_spark.sources.kafka import kafka_options, kafka_stream


def test_kafka_options_match_reference_notebook_exactly():
    """Every option the reference notebook sets, with its exact key and
    literal formatting — a drift here breaks real-broker deploys silently."""
    opts = kafka_options(
        bootstrap_servers="ns.servicebus.example:9093",
        topic="pos-events",
        sasl_jaas="org.apache.kafka.common.security.plain.PlainLoginModule required ...;",
    )
    assert opts == {
        "subscribe": "pos-events",
        "kafka.bootstrap.servers": "ns.servicebus.example:9093",
        "kafka.sasl.mechanism": "PLAIN",
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.jaas.config": (
            "org.apache.kafka.common.security.plain.PlainLoginModule required ...;"
        ),
        "kafka.request.timeout.ms": "60000",
        "kafka.session.timeout.ms": "60000",
        "failOnDataLoss": "false",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "100",
    }


def test_kafka_options_without_sasl_omit_auth_keys():
    opts = kafka_options("localhost:9092", "t")
    assert "kafka.sasl.jaas.config" not in opts
    assert "kafka.security.protocol" not in opts
    assert opts["subscribe"] == "t"


def test_kafka_stream_fails_lazily_without_connector(spark):
    """Without the connector jar, construction must fail at .load() with a
    recognizable error (callers treat it as 'no Kafka in this env'), not
    corrupt state or hang."""
    with pytest.raises(Exception, match="(?i)kafka"):
        kafka_stream(spark, "localhost:9092", "t")
