"""DLT-SQL authoring surface: ``Pipeline.sql_table`` parses the
reference's own gold entry-point dialect (`04_Silver-to-Gold
ETL.sql:68-103`) — SET trigger interval, CREATE LIVE TABLE with
COMMENT / TBLPROPERTIES / CONSTRAINT..EXPECT, LIVE. namespace
resolution, and STREAMING LIVE TABLE over STREAM(LIVE.x)."""

import os

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.pipeline import Pipeline, PipelineRunner


def _base_pipe(spark, tmp_path, storage_format="parquet"):
    pipe = Pipeline("sqlp", str(tmp_path / "storage"), storage_format=storage_format)

    @pipe.table(kind="live")
    def src(spark_):
        return spark_.range(0, 100).select(
            "id",
            (F.col("id") % 5).alias("grp"),
            (F.col("id") * 2).alias("qty"),
        )

    return pipe


def test_sql_table_parses_reference_shape(spark, tmp_path):
    """The reference's exact clause sequence: SET interval; CREATE LIVE
    TABLE with COMMENT + TBLPROPERTIES + AS SELECT over LIVE refs —
    registered like a decorator table and producing the right rows."""
    pipe = _base_pipe(spark, tmp_path)
    created = pipe.sql_table(
        """
        SET pipelines.trigger.interval = 5 minute;

        CREATE LIVE TABLE grp_totals
        COMMENT 'per-group totals'  -- trailing comment survives stripping
        TBLPROPERTIES (
          'quality'='gold'
          )
        AS
          SELECT grp, SUM(qty) AS total_qty   -- LIVE.x resolves via read()
          FROM LIVE.src
          GROUP BY grp
          ORDER BY total_qty DESC
        """
    )
    assert created == ["grp_totals"]
    t = pipe.tables["grp_totals"]
    assert t.kind == "live"
    assert t.comment == "per-group totals"
    assert t.interval == "5 minute"
    assert t.table_properties == {"quality": "gold"}
    assert t.deps == {"src"}
    # declared deps make topo_order right BEFORE the first run
    order = pipe.topo_order()
    assert order.index("src") < order.index("grp_totals")
    PipelineRunner(pipe).run_once(spark)
    got = {
        (r["grp"], r["total_qty"])
        for r in pipe.read(spark, "grp_totals").collect()
    }
    assert got == {(g, sum(2 * i for i in range(100) if i % 5 == g)) for g in range(5)}


def test_sql_table_delta_mode_and_expectations(spark, tmp_path):
    """The same surface over Delta storage, with a DLT SQL CONSTRAINT:
    ON VIOLATION DROP ROW drops exactly the violating rows and records
    the metrics, and the stored table is a real Delta table."""
    pipe = _base_pipe(spark, tmp_path, storage_format="delta")
    pipe.sql_table(
        """
        CREATE LIVE TABLE big_ids
        CONSTRAINT id_floor EXPECT (id >= 20) ON VIOLATION DROP ROW
        AS SELECT id, qty FROM LIVE.src
        """
    )
    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    assert pipe.read(spark, "big_ids").count() == 80
    m = runner.expectation_metrics["big_ids"]["id_floor"]
    assert m["failed"] == 20 and m["action"] == "drop"
    from pos_dlt_spark.sources.delta import delta_snapshot

    assert delta_snapshot(spark, pipe.table_path("big_ids")).version >= 0


def test_sql_table_streaming_live_table(spark, tmp_path):
    """STREAMING LIVE TABLE over STREAM(LIVE.x): the SQL body runs as a
    checkpointed stream (AvailableNow per pass) and a second pass with
    new upstream data appends exactly the new rows."""
    in_dir = str(tmp_path / "landing")
    os.makedirs(in_dir)
    pipe = Pipeline("sqls", str(tmp_path / "storage"))

    @pipe.table(kind="stream")
    def feed(spark_):
        schema = "id BIGINT, qty BIGINT"
        return spark_.readStream.schema(schema).json(in_dir)

    pipe.sql_table(
        """
        CREATE STREAMING LIVE TABLE doubled
        AS SELECT id, qty * 2 AS dqty FROM STREAM(LIVE.feed) WHERE id % 2 = 0
        """
    )
    assert pipe.tables["doubled"].kind == "stream"
    spark.range(0, 10).select("id", (F.col("id") + 1).alias("qty")).coalesce(
        1
    ).write.mode("append").json(in_dir)
    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    assert pipe.read(spark, "doubled").count() == 5
    spark.range(10, 20).select("id", (F.col("id") + 1).alias("qty")).coalesce(
        1
    ).write.mode("append").json(in_dir)
    runner.run_once(spark)
    got = sorted(
        (r["id"], r["dqty"]) for r in pipe.read(spark, "doubled").collect()
    )
    assert got == [(i, (i + 1) * 2) for i in range(0, 20, 2)]


def test_sql_table_refusals_and_set_conf(spark, tmp_path):
    pipe = _base_pipe(spark, tmp_path)
    # STREAM() in a non-streaming table
    with pytest.raises(ValueError, match="STREAMING"):
        pipe.sql_table(
            "CREATE LIVE TABLE x AS SELECT * FROM STREAM(LIVE.src)"
        )
    # STREAMING table without a stream source
    with pytest.raises(ValueError, match="STREAM\\(LIVE"):
        pipe.sql_table(
            "CREATE STREAMING LIVE TABLE x AS SELECT * FROM LIVE.src"
        )
    # no LIVE reference at all
    with pytest.raises(ValueError, match="LIVE"):
        pipe.sql_table("CREATE LIVE TABLE x AS SELECT 1 AS one")
    # non-CREATE, non-SET statement
    with pytest.raises(ValueError, match="unsupported"):
        pipe.sql_table("DROP TABLE src")
    # bad interval fails at declaration, not first tick
    with pytest.raises(ValueError, match="bad interval"):
        pipe.sql_table(
            "SET pipelines.trigger.interval = sometimes;"
            "CREATE LIVE TABLE x AS SELECT * FROM LIVE.src"
        )
    # empty script
    with pytest.raises(ValueError, match="no CREATE"):
        pipe.sql_table("-- just a comment")
    # other SET keys accumulate as pipeline conf
    pipe.sql_table(
        "SET pipelines.custom.flag = 'on';"
        "CREATE LIVE TABLE y AS SELECT grp FROM LIVE.src"
    )
    assert pipe.sql_conf == {"pipelines.custom.flag": "on"}


def test_sql_table_interval_applies_to_following_tables(spark, tmp_path):
    """DLT's SET-applies-to-what-follows rule: tables created before the
    SET keep no interval; every table after it inherits, until the next
    SET overrides."""
    pipe = _base_pipe(spark, tmp_path)
    pipe.sql_table(
        """
        CREATE LIVE TABLE before_set AS SELECT grp FROM LIVE.src;
        SET pipelines.trigger.interval = 5 minute;
        CREATE LIVE TABLE after_set AS SELECT grp FROM LIVE.src;
        SET pipelines.trigger.interval = 1 hour;
        CREATE LIVE TABLE after_second AS SELECT grp FROM LIVE.src
        """
    )
    assert pipe.tables["before_set"].interval is None
    assert pipe.tables["after_set"].interval == "5 minute"
    assert pipe.tables["after_second"].interval == "1 hour"


def test_sql_comment_and_quote_handling(spark, tmp_path):
    """Literals survive the comment stripper and statement splitter:
    a '--' inside a string is not a comment, a ';' inside a string is
    not a separator, and '' escapes a quote in COMMENT."""
    pipe = _base_pipe(spark, tmp_path)
    pipe.sql_table(
        """
        CREATE LIVE TABLE tricky
        COMMENT 'it''s got -- and ; inside'
        AS SELECT grp, '--not-a-comment;' AS marker FROM LIVE.src
        """
    )
    assert pipe.tables["tricky"].comment == "it's got -- and ; inside"
    PipelineRunner(pipe).run_once(spark)
    rows = pipe.read(spark, "tricky").collect()
    assert all(r["marker"] == "--not-a-comment;" for r in rows)


def test_sql_live_view_inlines_into_consumers(spark, tmp_path):
    """CREATE TEMPORARY LIVE VIEW: unpersisted, inlined into each
    consumer's single spark.sql plan; nested views compose; topo edges
    point through the view at the underlying TABLE; nothing lands on
    disk for the view itself."""
    pipe = _base_pipe(spark, tmp_path)
    created = pipe.sql_table(
        """
        CREATE TEMPORARY LIVE VIEW evens AS
          SELECT id, grp, qty FROM LIVE.src WHERE id % 2 = 0;
        CREATE LIVE VIEW evens_scaled AS
          SELECT id, grp, qty * 10 AS qty10 FROM LIVE.evens;
        CREATE LIVE TABLE even_totals AS
          SELECT grp, SUM(qty10) AS total FROM LIVE.evens_scaled GROUP BY grp
        """
    )
    assert created == ["evens", "evens_scaled", "even_totals"]
    assert "evens" in pipe.sql_views and "evens" not in pipe.tables
    # the table's topo dep is the TABLE src, through two view layers
    assert pipe.tables["even_totals"].deps == {"src"}
    order = pipe.topo_order()
    assert "evens" not in order and order.index("src") < order.index("even_totals")
    PipelineRunner(pipe).run_once(spark)
    got = {
        (r["grp"], r["total"]) for r in pipe.read(spark, "even_totals").collect()
    }
    want = {}
    for i in range(0, 100, 2):
        want[i % 5] = want.get(i % 5, 0) + i * 20
    assert got == set(want.items())
    # no persisted dir for the views
    import os as _os

    assert not _os.path.exists(pipe.table_path("evens"))
    assert not _os.path.exists(pipe.table_path("evens_scaled"))


def test_sql_live_view_refusals(spark, tmp_path):
    pipe = _base_pipe(spark, tmp_path)
    with pytest.raises(ValueError, match="unpersisted"):
        pipe.sql_table(
            "CREATE LIVE VIEW v TBLPROPERTIES ('a'='b') AS SELECT * FROM LIVE.src"
        )
    with pytest.raises(ValueError, match="STREAM"):
        pipe.sql_table(
            "CREATE LIVE VIEW v AS SELECT * FROM STREAM(LIVE.src)"
        )
    with pytest.raises(ValueError, match="LIVE"):
        pipe.sql_table("CREATE LIVE VIEW v AS SELECT 1 AS one")


def test_sql_apply_changes_into(spark, tmp_path):
    """DLT-SQL APPLY CHANGES INTO: the declared empty STREAMING target +
    the flow statement map onto the same apply_changes machinery as the
    Python entry point — latest-per-key upserts, APPLY AS DELETE WHEN
    tombstones, COLUMNS * EXCEPT dropping the op marker."""
    import json as _json

    in_dir = str(tmp_path / "cdc_landing")
    os.makedirs(in_dir)
    pipe = Pipeline("sqlc", str(tmp_path / "storage"))

    @pipe.table(kind="stream")
    def feed(spark_):
        schema = "k BIGINT, val STRING, seq BIGINT, op STRING"
        return spark_.readStream.schema(schema).json(in_dir)

    created = pipe.sql_table(
        """
        CREATE OR REFRESH STREAMING LIVE TABLE latest
        COMMENT 'keyed latest state';

        APPLY CHANGES INTO LIVE.latest
        FROM STREAM(LIVE.feed)
        KEYS (k)
        APPLY AS DELETE WHEN op = 'D'
        SEQUENCE BY seq
        COLUMNS * EXCEPT (op)
        """
    )
    assert created == ["latest", "latest"] or created == ["latest"] * 2
    flow = pipe.cdc_flows["latest"]
    assert flow.source == "feed" and flow.keys == ["k"]
    assert flow.apply_as_deletes == "op = 'D'"
    assert flow.except_column_list == ["op"]
    assert pipe.sql_declared_targets["latest"]["comment"] == "keyed latest state"

    rows = [
        {"k": 1, "val": "a1", "seq": 1, "op": "U"},
        {"k": 2, "val": "b1", "seq": 1, "op": "U"},
        {"k": 3, "val": "c1", "seq": 1, "op": "U"},
    ]
    with open(os.path.join(in_dir, "b1.json"), "w") as fh:
        fh.write("\n".join(_json.dumps(r) for r in rows))
    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    got = {(r["k"], r["val"]) for r in pipe.read(spark, "latest").collect()}
    assert got == {(1, "a1"), (2, "b1"), (3, "c1")}
    # second batch: stale update loses, newer wins, tombstone removes
    rows2 = [
        {"k": 1, "val": "STALE", "seq": 0, "op": "U"},
        {"k": 2, "val": "b2", "seq": 5, "op": "U"},
        {"k": 3, "val": "x", "seq": 5, "op": "D"},
    ]
    with open(os.path.join(in_dir, "b2.json"), "w") as fh:
        fh.write("\n".join(_json.dumps(r) for r in rows2))
    runner.run_once(spark)
    df = pipe.read(spark, "latest")
    assert "op" not in df.columns, "COLUMNS * EXCEPT must drop the marker"
    got2 = {(r["k"], r["val"]) for r in df.collect()}
    assert got2 == {(1, "a1"), (2, "b2")}


def test_sql_apply_changes_refusals(spark, tmp_path):
    pipe = _base_pipe(spark, tmp_path)
    # r11: SCD TYPE 2 is now a supported maintained mode; only non-DLT
    # type numbers refuse
    with pytest.raises(ValueError, match="SCD\\s+TYPE 3"):
        pipe.sql_table(
            "APPLY CHANGES INTO LIVE.t FROM STREAM(LIVE.src) KEYS (id) "
            "SEQUENCE BY qty STORED AS SCD TYPE 3"
        )
    pipe.sql_table(
        "APPLY CHANGES INTO LIVE.t2 FROM STREAM(LIVE.src) KEYS (id) "
        "SEQUENCE BY qty STORED AS SCD TYPE 2"
    )
    assert pipe.cdc_flows["t2"].stored_as_scd_type == 2
    with pytest.raises(ValueError, match="KEYS"):
        pipe.sql_table(
            "APPLY CHANGES INTO LIVE.t FROM STREAM(LIVE.src) KEYS () SEQUENCE BY qty"
        )
    # declaration-only CREATE must be STREAMING
    with pytest.raises(ValueError, match="without an AS body"):
        pipe.sql_table("CREATE LIVE TABLE bare")


def test_sql_partitioned_by_reaches_storage(spark, tmp_path):
    """PARTITIONED BY in the SQL dialect flows to the stored layout and
    a partition-key filter reaches PartitionFilters in the scan."""
    pipe = _base_pipe(spark, tmp_path)
    pipe.sql_table(
        """
        CREATE LIVE TABLE by_grp
        PARTITIONED BY (grp)
        AS SELECT grp, id, qty FROM LIVE.src
        """
    )
    assert pipe.tables["by_grp"].partition_by == ["grp"]
    PipelineRunner(pipe).run_once(spark)
    root = pipe.table_path("by_grp")
    assert any(d.startswith("grp=") for d in os.listdir(root))
    plan = (
        pipe.read(spark, "by_grp")
        .filter(F.col("grp") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "grp" in pf


def test_sql_apply_changes_scd2_flow(spark, tmp_path):
    """DLT-SQL STORED AS SCD TYPE 2 (VERDICT r10 #1): the flow maintains
    version HISTORY across pipeline updates — a later batch's newer
    version closes the prior one, a tombstone closes without adding a
    version, and an out-of-order row re-bounds the middle of history."""
    import json as _json

    in_dir = str(tmp_path / "cdc_landing")
    os.makedirs(in_dir)
    pipe = Pipeline("sqlscd2", str(tmp_path / "storage"))

    @pipe.table(kind="stream")
    def feed(spark_):
        schema = "k BIGINT, val STRING, seq BIGINT, op STRING"
        return spark_.readStream.schema(schema).json(in_dir)

    pipe.sql_table(
        """
        CREATE OR REFRESH STREAMING LIVE TABLE hist;

        APPLY CHANGES INTO LIVE.hist
        FROM STREAM(LIVE.feed)
        KEYS (k)
        APPLY AS DELETE WHEN op = 'D'
        SEQUENCE BY seq
        COLUMNS * EXCEPT (op)
        STORED AS SCD TYPE 2
        """
    )
    assert pipe.cdc_flows["hist"].stored_as_scd_type == 2

    def land(name, rows):
        with open(os.path.join(in_dir, name), "w") as fh:
            fh.write("\n".join(_json.dumps(r) for r in rows))

    runner = PipelineRunner(pipe)
    land("b1.json", [
        {"k": 1, "val": "a1", "seq": 10, "op": "U"},
        {"k": 2, "val": "b1", "seq": 10, "op": "U"},
    ])
    runner.run_once(spark)
    land("b2.json", [
        {"k": 1, "val": "a3", "seq": 30, "op": "U"},   # new current
        {"k": 2, "val": "", "seq": 20, "op": "D"},     # tombstone closes
    ])
    runner.run_once(spark)
    land("b3.json", [
        {"k": 1, "val": "a2", "seq": 20, "op": "U"},   # out-of-order middle
    ])
    runner.run_once(spark)
    df = pipe.read(spark, "hist")
    assert "op" not in df.columns and "__tombstone" not in df.columns
    got = sorted(
        (r["k"], r["seq"], r["val"], r["__START_AT"], r["__END_AT"])
        for r in df.collect()
    )
    assert got == [
        (1, 10, "a1", 10, 20),
        (1, 20, "a2", 20, 30),
        (1, 30, "a3", 30, None),
        (2, 10, "b1", 10, 20),   # closed by the tombstone, never current
    ], got


def test_scd2_flow_delta_mode(spark, tmp_path):
    """SCD2 over Delta storage: the history is maintained by atomic MERGE
    commits on the full version identity — same final state as the
    parquet engine, real _delta_log, batch replays are SetTransaction
    no-ops."""
    import json as _json

    in_dir = str(tmp_path / "cdc_landing")
    os.makedirs(in_dir)
    pipe = Pipeline("dscd2", str(tmp_path / "storage"), storage_format="delta")

    @pipe.table(kind="stream")
    def feed(spark_):
        schema = "k BIGINT, val STRING, seq BIGINT, op STRING"
        return spark_.readStream.schema(schema).json(in_dir)

    pipe.apply_changes(
        target="hist", source="feed", keys=["k"], sequence_by="seq",
        apply_as_deletes="op = 'D'", except_column_list=["op"],
        stored_as_scd_type=2,
    )

    def land(name, rows):
        with open(os.path.join(in_dir, name), "w") as fh:
            fh.write("\n".join(_json.dumps(r) for r in rows))

    runner = PipelineRunner(pipe)
    land("b1.json", [
        {"k": 1, "val": "a1", "seq": 10, "op": "U"},
        {"k": 2, "val": "b1", "seq": 10, "op": "U"},
    ])
    runner.run_once(spark)
    land("b2.json", [
        {"k": 1, "val": "a2", "seq": 20, "op": "U"},
        {"k": 2, "val": "", "seq": 20, "op": "D"},
        {"k": 1, "val": "a1", "seq": 10, "op": "U"},  # replayed row: no dup
    ])
    runner.run_once(spark)
    assert os.path.isdir(os.path.join(pipe.table_path("hist"), "_delta_log"))
    df = pipe.read(spark, "hist")
    assert "__tombstone" not in df.columns
    got = sorted(
        (r["k"], r["seq"], r["val"], r["__START_AT"], r["__END_AT"])
        for r in df.collect()
    )
    assert got == [
        (1, 10, "a1", 10, 20),
        (1, 20, "a2", 20, None),
        (2, 10, "b1", 10, 20),
    ], got
    # untouched keys' rows stay byte-identical across a third update
    land("b3.json", [{"k": 3, "val": "c1", "seq": 5, "op": "U"}])
    runner.run_once(spark)
    got3 = sorted(
        (r["k"], r["seq"], r["val"], r["__START_AT"], r["__END_AT"])
        for r in pipe.read(spark, "hist").collect()
    )
    assert got3 == got + [(3, 5, "c1", 5, None)], got3


def test_sql_apply_changes_track_history(spark, tmp_path):
    """DLT SQL: TRACK HISTORY ON * EXCEPT (cols) parses into
    track_history_except_column_list on an SCD2 flow."""
    pipe = _base_pipe(spark, tmp_path)
    pipe.sql_table(
        "APPLY CHANGES INTO LIVE.t3 FROM STREAM(LIVE.src) KEYS (id) "
        "SEQUENCE BY qty STORED AS SCD TYPE 2 "
        "TRACK HISTORY ON * EXCEPT (grp)"
    )
    flow = pipe.cdc_flows["t3"]
    assert flow.stored_as_scd_type == 2
    assert flow.track_history_except_column_list == ["grp"]
    # track history without SCD2 refuses at declaration
    with pytest.raises(ValueError, match="stored_as_scd_type=2"):
        pipe.apply_changes(
            target="t4", source="src", keys=["id"], sequence_by="qty",
            track_history_except_column_list=["grp"],
        )


def test_sql_apply_changes_ignore_null_and_column_list(spark, tmp_path):
    """DLT SQL: IGNORE NULL UPDATES and COLUMNS (positive list) parse
    into the flow definition."""
    pipe = _base_pipe(spark, tmp_path)
    pipe.sql_table(
        "APPLY CHANGES INTO LIVE.t5 FROM STREAM(LIVE.src) KEYS (id) "
        "IGNORE NULL UPDATES "
        "SEQUENCE BY qty "
        "COLUMNS (id, qty, grp)"
    )
    flow = pipe.cdc_flows["t5"]
    assert flow.ignore_null_updates is True
    assert flow.column_list == ["id", "qty", "grp"]
    assert flow.except_column_list is None
    # delta-mode boundary: unbucketed delta flow + ignore_null refuses
    dpipe = _base_pipe(spark, tmp_path, storage_format="delta")
    with pytest.raises(ValueError, match="ignore_null_updates"):
        dpipe.apply_changes(
            target="t6", source="src", keys=["id"], sequence_by="qty",
            ignore_null_updates=True,
        )


def test_scd2_delta_same_sequence_tombstone_parity(spark, tmp_path):
    """ADVICE r11 (pipeline.py delta scd2_sink): a retained tombstone and
    a data version at the SAME sequence are distinct stored rows; the
    Delta MERGE key must include __tombstone or the latest-per-key
    window collapses them — a same-sequence update arriving in a later
    batch would silently erase the stored tombstone and resurrect the
    key. Pin engine parity: parquet and delta storage produce identical
    histories for the same landing sequence."""
    import json as _json

    def run_engine(fmt):
        in_dir = str(tmp_path / f"land_{fmt}")
        os.makedirs(in_dir)
        pipe = Pipeline(f"par_{fmt}", str(tmp_path / f"s_{fmt}"),
                        storage_format=fmt)

        @pipe.table(kind="stream")
        def feed(spark_):
            schema = "k BIGINT, val STRING, seq BIGINT, op STRING"
            return spark_.readStream.schema(schema).json(in_dir)

        pipe.apply_changes(
            target="hist", source="feed", keys=["k"], sequence_by="seq",
            apply_as_deletes="op = 'D'", except_column_list=["op"],
            stored_as_scd_type=2,
        )
        runner = PipelineRunner(pipe)
        batches = [
            [{"k": 1, "val": "a1", "seq": 10, "op": "U"}],
            # tombstone at seq 20 lands FIRST ...
            [{"k": 1, "val": "", "seq": 20, "op": "D"}],
            # ... then a LATER batch carries a data version at the SAME
            # sequence: it must not erase the stored tombstone
            [{"k": 1, "val": "a2", "seq": 20, "op": "U"}],
        ]
        for i, rows in enumerate(batches):
            with open(os.path.join(in_dir, f"b{i}.json"), "w") as fh:
                fh.write("\n".join(_json.dumps(r) for r in rows))
            runner.run_once(spark)
        return sorted(
            (r["k"], r["seq"], r["val"], r["__START_AT"], r["__END_AT"])
            for r in pipe.read(spark, "hist").collect()
        )

    parquet = run_engine("parquet")
    delta = run_engine("delta")
    assert delta == parquet, (parquet, delta)
    # and in both engines the key stays DEAD: no open (__END_AT NULL) row
    assert not [r for r in delta if r[4] is None], delta


def test_cdc_counted_caches_micro_batch(spark, tmp_path, monkeypatch):
    """ADVICE r11 (pipeline.py counted): the event-log counters consume
    the same micro-batch as the sink; the batch must be persisted ONCE
    before both, not re-executed from the source per counter pass."""
    import json as _json

    # patch the CLASSIC subclass: pyspark 4's pyspark.sql.DataFrame is the
    # dispatch base and its persist is overridden there
    from pyspark.sql.classic.dataframe import DataFrame

    persisted = []
    orig_persist = DataFrame.persist
    orig_unpersist = DataFrame.unpersist

    def spy_persist(self, *a, **kw):
        persisted.append("persist")
        return orig_persist(self, *a, **kw)

    def spy_unpersist(self, *a, **kw):
        persisted.append("unpersist")
        return orig_unpersist(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "persist", spy_persist)
    monkeypatch.setattr(DataFrame, "unpersist", spy_unpersist)

    in_dir = str(tmp_path / "land")
    os.makedirs(in_dir)
    pipe = Pipeline("cnt", str(tmp_path / "storage"))

    @pipe.table(kind="stream")
    def feed(spark_):
        return spark_.readStream.schema("k BIGINT, seq BIGINT").json(in_dir)

    pipe.apply_changes(target="cur", source="feed", keys=["k"],
                       sequence_by="seq")
    with open(os.path.join(in_dir, "b0.json"), "w") as fh:
        fh.write("\n".join(_json.dumps({"k": i, "seq": 1}) for i in range(5)))
    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    # the micro-batch was cached exactly around the sink+counter pass
    assert "persist" in persisted and "unpersist" in persisted
    # and the logged counts are right
    import json as _j

    rows = [_j.loads(e["details"]) for e in pipe.event_log(spark).collect()
            if e["event_type"] == "flow_progress" and e["table_name"] == "cur"]
    assert rows and rows[0]["num_source_rows"] == 5
    assert rows[0]["num_upserted_rows"] == 5


def test_sql_apply_changes_track_history_positive(spark, tmp_path):
    """DLT SQL: TRACK HISTORY ON (cols) — the positive form — parses
    into track_history_column_list, end-to-end through the pipeline
    runner: only listed columns' changes open versions."""
    import json as _json

    in_dir = str(tmp_path / "land")
    os.makedirs(in_dir)
    pipe = Pipeline("p_trackon", str(tmp_path / "store"))

    @pipe.table(kind="stream")
    def src(spark_):
        schema = "k INT, seq INT, v STRING, note STRING"
        return spark_.readStream.schema(schema).json(in_dir)

    pipe.sql_table(
        "APPLY CHANGES INTO LIVE.hist FROM STREAM(LIVE.src) KEYS (k) "
        "SEQUENCE BY seq STORED AS SCD TYPE 2 "
        "TRACK HISTORY ON (v)"
    )
    flow = pipe.cdc_flows["hist"]
    assert flow.stored_as_scd_type == 2
    assert flow.track_history_column_list == ["v"]
    assert flow.track_history_except_column_list is None

    def land(name, rows):
        with open(os.path.join(in_dir, name), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    land("b1.json", [
        {"k": 1, "seq": 10, "v": "a", "note": "n1"},
        {"k": 1, "seq": 20, "v": "a", "note": "n2"},
        {"k": 1, "seq": 30, "v": "b", "note": "n3"},
    ])
    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    got = sorted(
        (r["k"], r["v"], r["note"], r["__START_AT"], r["__END_AT"])
        for r in pipe.read(spark, "hist").collect()
    )
    # note-only change at seq 20 absorbed in place; v change versions
    assert got == [(1, "a", "n2", 10, 30), (1, "b", "n3", 30, None)], got


def test_scd2_track_history_positive_delta_mode(spark, tmp_path):
    """Positive form over Delta storage: the runner's scd2 sink derives
    the untracked set from the batch schema (everything not listed), so
    the Delta MERGE engine collapses note-only runs exactly like the
    parquet engine."""
    import json as _json

    in_dir = str(tmp_path / "land")
    os.makedirs(in_dir)
    pipe = Pipeline("d_trackon", str(tmp_path / "store"),
                    storage_format="delta")

    @pipe.table(kind="stream")
    def feed(spark_):
        schema = "k INT, seq INT, v STRING, note STRING"
        return spark_.readStream.schema(schema).json(in_dir)

    pipe.apply_changes(
        target="hist", source="feed", keys=["k"], sequence_by="seq",
        stored_as_scd_type=2, track_history_column_list=["v"],
    )

    def land(name, rows):
        with open(os.path.join(in_dir, name), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    land("b1.json", [
        {"k": 1, "seq": 10, "v": "a", "note": "n1"},
        {"k": 1, "seq": 20, "v": "a", "note": "n2"},
        {"k": 1, "seq": 30, "v": "b", "note": "n3"},
    ])
    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    assert os.path.isdir(os.path.join(pipe.table_path("hist"), "_delta_log"))
    got = sorted(
        (r["k"], r["v"], r["note"], r["__START_AT"], r["__END_AT"])
        for r in pipe.read(spark, "hist").collect()
    )
    assert got == [(1, "a", "n2", 10, 30), (1, "b", "n3", 30, None)], got
