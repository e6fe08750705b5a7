"""In-commit timestamps (protocol 'inCommitTimestamp' writer feature):
stamping at the commit choke point, strict monotonicity under clock
skew, enablement bookkeeping (version + timestamp properties pinned to
the enablement commit's own stamp), TIMESTAMP AS OF preferring the
stamped value over mtimes, history surfacing, and fsck invariants."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.sources.delta import (
    delta_history,
    delta_snapshot,
    read_delta,
    version_at_timestamp,
)
from pos_dlt_spark.sources.delta_writer import (
    delta_delete,
    delta_set_properties,
    write_delta,
)

ICT_CONF = {"delta.enableInCommitTimestamps": "true"}


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def _icts(table):
    out = {}
    log = os.path.join(table, "_delta_log")
    for n in sorted(os.listdir(log)):
        if not n.endswith(".json"):
            continue
        with open(os.path.join(log, n)) as fh:
            for line in fh:
                a = json.loads(line)
                if "commitInfo" in a:
                    out[int(n.split(".")[0])] = a["commitInfo"].get(
                        "inCommitTimestamp"
                    )
                    break
    return out


def test_every_commit_stamped_and_monotonic(spark, tmp_path):
    t = str(tmp_path / "ict")
    write_delta(_df(spark, 0, 10).coalesce(1), t, configuration=ICT_CONF)
    write_delta(_df(spark, 10, 20).coalesce(1), t)
    delta_delete(spark, t, "id = 3")
    icts = _icts(t)
    assert set(icts) == {0, 1, 2} and all(v is not None for v in icts.values())
    assert icts[0] < icts[1] < icts[2]
    snap = delta_snapshot(spark, t)
    assert "inCommitTimestamp" in set(snap.protocol.get("writerFeatures") or ())


def test_monotonic_under_backwards_clock(spark, tmp_path, monkeypatch):
    """A writer whose wall clock runs BEHIND the previous commit still
    stamps prior+1 — the spec's monotonicity guarantee."""
    t = str(tmp_path / "ict")
    write_delta(_df(spark, 0, 5).coalesce(1), t, configuration=ICT_CONF)
    icts0 = _icts(t)[0]
    import time as _time

    real_time = _time.time
    monkeypatch.setattr(_time, "time", lambda: real_time() - 3600.0)
    write_delta(_df(spark, 5, 8).coalesce(1), t)
    icts = _icts(t)
    assert icts[1] == icts0 + 1  # clamped, not skewed backwards


def test_enablement_on_existing_table_pins_version_and_timestamp(spark, tmp_path):
    t = str(tmp_path / "ict")
    write_delta(_df(spark, 0, 5).coalesce(1), t)  # v0 plain
    write_delta(_df(spark, 5, 9).coalesce(1), t)  # v1 plain
    v = delta_set_properties(spark, t, ICT_CONF)
    assert v == 2
    snap = delta_snapshot(spark, t)
    conf = snap.configuration
    assert conf["delta.inCommitTimestampEnablementVersion"] == "2"
    assert int(conf["delta.inCommitTimestampEnablementTimestamp"]) == _icts(t)[2]
    icts = _icts(t)
    assert icts[0] is None and icts[1] is None and icts[2] is not None
    write_delta(_df(spark, 9, 12).coalesce(1), t)  # post-enablement append
    assert _icts(t)[3] > icts[2]
    from pos_dlt_spark.sources.delta_check import delta_fsck

    assert delta_fsck(spark, t) == []


def test_timestamp_time_travel_uses_ict_over_mtime(spark, tmp_path):
    """Surgically move the stamps far into the past: TIMESTAMP AS OF
    must follow the stamped values, not the (current) file mtimes."""
    t = str(tmp_path / "ict")
    write_delta(_df(spark, 0, 5).coalesce(1), t, configuration=ICT_CONF)
    write_delta(_df(spark, 5, 9).coalesce(1), t)
    log = os.path.join(t, "_delta_log")
    for v, fake in ((0, 1_000_000), (1, 2_000_000)):
        p = os.path.join(log, f"{v:020d}.json")
        lines = [json.loads(x) for x in open(p)]
        for a in lines:
            if "commitInfo" in a:
                a["commitInfo"]["inCommitTimestamp"] = fake
        with open(p, "w") as fh:
            for a in lines:
                fh.write(json.dumps(a) + "\n")
    assert version_at_timestamp(t, 1_500) == 0  # seconds
    assert version_at_timestamp(t, 2_500) == 1
    assert read_delta(spark, t, timestamp=1_500).count() == 5
    hist = {r.version: r.timestamp for r in delta_history(spark, t).collect()}
    assert hist[0] == 1_000.0 and hist[1] == 2_000.0
    with pytest.raises(ValueError, match="no commit at or before"):
        version_at_timestamp(t, 500)


def test_fsck_flags_gap_and_regression(spark, tmp_path):
    from pos_dlt_spark.sources.delta_check import delta_fsck

    t = str(tmp_path / "ict")
    write_delta(_df(spark, 0, 5).coalesce(1), t, configuration=ICT_CONF)
    write_delta(_df(spark, 5, 9).coalesce(1), t)
    assert delta_fsck(spark, t) == []
    # regress commit 1's stamp below commit 0's
    log = os.path.join(t, "_delta_log")
    p = os.path.join(log, f"{1:020d}.json")
    lines = [json.loads(x) for x in open(p)]
    for a in lines:
        if "commitInfo" in a:
            a["commitInfo"]["inCommitTimestamp"] = 1
    with open(p, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    findings = delta_fsck(spark, t)
    assert any(c == "ict" and "strictly increasing" in m for _s, c, m in findings)


def test_stamping_survives_log_cleanup(spark, tmp_path):
    """Log cleanup can delete the PREVIOUS commit's JSON (checkpoint at
    the tip): stamping must continue — the writer decides from the
    folded table configuration, not only prior-commit inheritance."""
    from pos_dlt_spark.sources.delta_writer import delta_log_cleanup

    t = str(tmp_path / "ict")
    write_delta(
        _df(spark, 0, 5).coalesce(1), t,
        configuration=ICT_CONF, checkpoint_interval=1,
    )
    write_delta(_df(spark, 5, 9).coalesce(1), t, checkpoint_interval=1)
    gone = delta_log_cleanup(spark, t)
    assert gone  # the tip JSONs really were removed
    write_delta(_df(spark, 9, 12).coalesce(1), t)
    icts = _icts(t)
    assert icts.get(2) is not None  # still stamped
    from pos_dlt_spark.sources.delta_check import delta_fsck

    assert not [f for f in delta_fsck(spark, t) if f[1] == "ict"]
