"""Explicit schemas for every table surface in the engine.

POS schemas mirror the reference's StructType literals exactly
(SURVEY.md §1.3; reference `03_Bronze-to-Silver ETL.py:118-121,175-180,
206-209,285-296,339-346`, `02_Data Generation.py:79-86`). Schema inference is
never used — the reference reads even header-bearing CSVs with explicit
schemas (`03:131-139`), and so do we.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TIMESTAMP_FORMAT = "yyyy-MM-dd HH:mm:ss"

# --- POS reference tables -------------------------------------------------

# reference 03_Bronze-to-Silver ETL.py:118-121
STORE_SCHEMA = StructType(
    [
        StructField("store_id", IntegerType()),
        StructField("name", StringType()),
    ]
)

# reference 03_Bronze-to-Silver ETL.py:175-180
ITEM_SCHEMA = StructType(
    [
        StructField("item_id", IntegerType()),
        StructField("name", StringType()),
        StructField("supplier_id", IntegerType()),
        StructField("safety_stock_quantity", IntegerType()),
    ]
)

# reference 03_Bronze-to-Silver ETL.py:206-209
INVENTORY_CHANGE_TYPE_SCHEMA = StructType(
    [
        StructField("change_type_id", IntegerType()),
        StructField("change_type", StringType()),
    ]
)

# flat change-event CSV, reference 02_Data Generation.py:79-86
INVENTORY_CHANGE_CSV_SCHEMA = StructType(
    [
        StructField("trans_id", StringType()),
        StructField("item_id", IntegerType()),
        StructField("store_id", IntegerType()),
        StructField("date_time", TimestampType()),
        StructField("quantity", IntegerType()),
        StructField("change_type_id", IntegerType()),
    ]
)

# nested Kafka payload JSON, reference 03_Bronze-to-Silver ETL.py:285-296
EVENT_PAYLOAD_SCHEMA = StructType(
    [
        StructField("trans_id", StringType()),
        StructField("store_id", IntegerType()),
        StructField("date_time", TimestampType()),
        StructField("change_type_id", IntegerType()),
        StructField(
            "items",
            ArrayType(
                StructType(
                    [
                        StructField("item_id", IntegerType()),
                        StructField("quantity", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

# Kafka envelope (fixed by the Kafka source, reference 03:267-277)
KAFKA_ENVELOPE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

# snapshot CSV as landed (pandas index artifact `id`, dropped on ingest),
# reference 03_Bronze-to-Silver ETL.py:339-346
INVENTORY_SNAPSHOT_CSV_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("item_id", IntegerType()),
        StructField("employee_id", IntegerType()),
        StructField("store_id", IntegerType()),
        StructField("date_time", TimestampType()),
        StructField("quantity", IntegerType()),
    ]
)

# silver inventory_change (post parse/explode), reference 03:310-320
INVENTORY_CHANGE_SILVER_SCHEMA = StructType(
    [
        StructField("trans_id", StringType()),
        StructField("store_id", IntegerType()),
        StructField("date_time", TimestampType()),
        StructField("change_type_id", IntegerType()),
        StructField("item_id", IntegerType()),
        StructField("quantity", IntegerType()),
    ]
)

# gold inventory_current, reference 04_Silver-to-Gold ETL.sql:76-82
INVENTORY_CURRENT_SCHEMA = StructType(
    [
        StructField("store_id", IntegerType()),
        StructField("item_id", IntegerType()),
        StructField("snapshot_quantity", IntegerType()),
        StructField("change_quantity", LongType()),
        StructField("current_inventory", LongType()),
        StructField("date_time", TimestampType()),
    ]
)

POS_TABLE_SCHEMAS = {
    "store": STORE_SCHEMA,
    "item": ITEM_SCHEMA,
    "inventory_change_type": INVENTORY_CHANGE_TYPE_SCHEMA,
    "inventory_change_csv": INVENTORY_CHANGE_CSV_SCHEMA,
    "inventory_snapshot_csv": INVENTORY_SNAPSHOT_CSV_SCHEMA,
    "inventory_change": INVENTORY_CHANGE_SILVER_SCHEMA,
    "inventory_current": INVENTORY_CURRENT_SCHEMA,
}

# --- Training-data extension tables (TESTDATA.md) -------------------------

from pyspark.sql.types import DoubleType, FloatType  # noqa: E402

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# multimodal: opaque binary payload + typed metadata (SURVEY.md §7.4)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)
