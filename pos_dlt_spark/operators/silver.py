"""Silver transforms — reference `03_Bronze-to-Silver ETL.py:299-324`.

The parse chain is exactly the reference's: Kafka ``value`` binary ->
cast string -> ``from_json`` against the explicit payload schema ->
project nested fields -> ``explode_outer`` the items array (outer: a
header-only event with NULL/empty items keeps its row) -> event-time
watermark -> stateful dedup on (trans_id, item_id).

The dedup collapses oversize-message fragments: the generator re-sends a
transaction split into one-item messages (`02:288-296`), so the same
(trans_id, item_id) pair can arrive multiple times within the horizon.

Scale note: ``dropDuplicates`` keeps one state entry per key until the
watermark passes; a 1-hour horizon bounds state to the keys seen in the
last hour regardless of total stream length. The shuffle it introduces
hash-partitions by the dedup key — the same key layout the downstream
gold aggregation uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pos_dlt_spark.schemas import EVENT_PAYLOAD_SCHEMA


def parse_inventory_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Envelope -> flat silver rows (works on both streaming and batch
    DataFrames; `raw` needs only a binary/string `value_col`)."""
    event = F.from_json(F.col(value_col).cast("string"), EVENT_PAYLOAD_SCHEMA)
    return (
        raw.withColumn("event", event)
        .select(
            F.col("event.trans_id").alias("trans_id"),
            F.col("event.store_id").alias("store_id"),
            F.col("event.date_time").alias("date_time"),
            F.col("event.change_type_id").alias("change_type_id"),
            F.explode_outer(F.col("event.items")).alias("item"),
        )
        .withColumn("item_id", F.col("item.item_id"))
        .withColumn("quantity", F.col("item.quantity"))
        .drop("item")
    )


def dedup_inventory_change(df: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked stateful dedup (reference W1/W2, `03:321-322`).

    The reference writes ``dropDuplicates(['trans_id','item_id'])`` under a
    watermark — but plain dropDuplicates only evicts state when the event
    time column is part of the dedup KEYS, so that exact form keeps state
    for every key ever seen (unbounded at 100 TB). We use
    ``dropDuplicatesWithinWatermark`` — the operator Spark added for
    precisely this pattern: dedup on the business keys alone, state evicted
    once the watermark passes an entry's event time + delay. Same intended
    semantics (resent fragments within the 1 h horizon collapse), bounded
    memory."""
    return df.withWatermark("date_time", watermark).dropDuplicatesWithinWatermark(
        ["trans_id", "item_id"]
    )


def strip_braces(col: str | F.Column) -> F.Column:
    """GUID brace strip — reference F1 (`02:104`):
    substring(s, 2, length(s)-2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.substr(F.lit(2), F.length(c) - 2)
