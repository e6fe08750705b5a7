"""Silver parse chain + streaming dedup (reference `03:299-324`)."""

import json
import os

from pyspark.sql import functions as F

from pos_dlt_spark.operators.silver import (
    dedup_inventory_change,
    parse_inventory_events,
    strip_braces,
)


def _payload(trans_id, store_id, dt, ct, items):
    return json.dumps(
        {
            "trans_id": trans_id,
            "store_id": store_id,
            "date_time": dt,
            "change_type_id": ct,
            "items": items,
        }
    )


def test_parse_explodes_items(spark):
    raw = spark.createDataFrame(
        [
            (_payload("t1", 1, "2021-01-01 10:00:00", 1,
                      [{"item_id": 7, "quantity": -2}, {"item_id": 8, "quantity": -1}]),),
        ],
        ["value"],
    )
    rows = parse_inventory_events(raw).collect()
    assert {(r.trans_id, r.item_id, r.quantity) for r in rows} == {("t1", 7, -2), ("t1", 8, -1)}
    assert all(r.store_id == 1 and r.change_type_id == 1 for r in rows)


def test_parse_explode_outer_keeps_header_only_events(spark):
    raw = spark.createDataFrame(
        [
            (_payload("t_null", 2, "2021-01-01 11:00:00", 1, None),),
            (_payload("t_empty", 2, "2021-01-01 11:05:00", 1, []),),
        ],
        ["value"],
    )
    rows = parse_inventory_events(raw).collect()
    assert {(r.trans_id, r.item_id) for r in rows} == {("t_null", None), ("t_empty", None)}


def test_parse_from_binary_value(spark):
    raw = spark.createDataFrame(
        [(_payload("tb", 1, "2021-01-01 10:00:00", 2, [{"item_id": 1, "quantity": 5}]).encode(),)],
        ["value"],
    )
    rows = parse_inventory_events(raw).collect()
    assert rows[0].trans_id == "tb" and rows[0].quantity == 5


def test_streaming_dedup_collapses_fragment_resends(spark, tmp_path):
    """Duplicate (trans_id, item_id) within the watermark horizon counted
    once — the reference's oversize-message resend case (`02:288-296`)."""
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    full = _payload("tx", 1, "2021-01-01 10:00:00", 1,
                    [{"item_id": 1, "quantity": -1}, {"item_id": 2, "quantity": -2}])
    frag1 = _payload("tx", 1, "2021-01-01 10:00:00", 1, [{"item_id": 1, "quantity": -1}])
    frag2 = _payload("tx", 1, "2021-01-01 10:00:00", 1, [{"item_id": 2, "quantity": -2}])
    other = _payload("ty", 1, "2021-01-01 10:30:00", 1, [{"item_id": 1, "quantity": -3}])
    (events_dir / "a.json").write_text("\n".join([full, frag1, frag2, other]) + "\n")

    raw = spark.readStream.format("text").load(str(events_dir))
    silver = dedup_inventory_change(parse_inventory_events(raw))
    q = (
        silver.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    assert {(r.trans_id, r.item_id, r.quantity) for r in rows} == {
        ("tx", 1, -1),
        ("tx", 2, -2),
        ("ty", 1, -3),
    }


def test_streaming_dedup_state_bounded_by_watermark(spark, tmp_path):
    """W1/W2 contract (`03:321-322`) as dropDuplicatesWithinWatermark
    delivers it: the 1 h horizon bounds STATE — once the watermark passes
    an entry's event time, its state row is evicted (observable in the
    state-operator metrics) — while a resend arriving behind the watermark
    is filtered as late input, so the output stays exactly-once. Plain
    dropDuplicates on business keys would never evict (the reference's
    literal form is unbounded at scale); see operators/silver.py."""
    import time as _time

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    first = _payload("t1", 1, "2021-01-01 10:00:00", 1, [{"item_id": 1, "quantity": -1}])
    advance = _payload("t2", 1, "2021-01-01 13:00:00", 1, [{"item_id": 1, "quantity": -2}])
    now = _time.time()
    for i, (name, content) in enumerate(
        [("a.json", first), ("b.json", advance), ("c.json", first)]
    ):
        p = events_dir / name
        p.write_text(content + "\n")
        os.utime(p, (now + i * 10, now + i * 10))  # force batch order

    raw = spark.readStream.format("text").option("maxFilesPerTrigger", "1").load(str(events_dir))
    silver = dedup_inventory_change(parse_inventory_events(raw))
    q = (
        silver.writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [r.trans_id for r in spark.sql("SELECT * FROM late_out").collect()]
    assert sorted(rows) == ["t1", "t2"]  # exactly-once output
    # bounded state: after the watermark hit 12:00, t1's entry is gone
    state_rows = [
        op["numRowsTotal"]
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    ]
    assert state_rows[-1] == 1 and max(state_rows) == 2


def test_strip_braces(spark):
    df = spark.createDataFrame([("{abc-def}",)], ["trans_id"])
    assert df.select(strip_braces("trans_id").alias("s")).collect()[0].s == "abc-def"
