"""Table invariant checker (an ``fsck`` for the protocol Delta suite) —
the diagnostic a data platform runs before trusting a table it did not
write. Pure driver-side metadata plus per-file existence/footer probes:
no data scan, cost rides FILE COUNT, not row count.

Checks (each finding is (severity, code, message)):

- ``log``: version chain is gap-free from the fold's base.
- ``files``: every live file exists with the add action's exact size.
- ``dv``: every deletion vector resolves, decodes, and its decoded
  cardinality equals the descriptor's declared cardinality.
- ``protocol``: features actually IN USE (deletion vectors, column
  mapping, generated columns, identity columns, v2 checkpoints) are
  covered by the declared protocol — a table whose files carry DVs
  under minReaderVersion 1 will silently resurrect deleted rows in
  spec-compliant readers that honor the declaration.
- ``mapping``: column-mapping metadata is complete (physical names;
  field ids in id mode) and physical names are unique.
- ``stats``: per-file stats JSON parses (unparseable stats silently
  disable skipping — worth surfacing, not an error).
- ``partition``: add.partitionValues keys match the table's partition
  columns under their PHYSICAL names.

Severities: ``error`` = readers may return wrong data; ``warn`` =
degraded (skipping disabled, metadata oddity) but reads stay correct.
"""

from __future__ import annotations

import json
import os

from pos_dlt_spark.sources.delta import _abs_file, _list_log, delta_snapshot


FSCK_PARALLEL_MIN = 100_000


def _probe_files_parallel(spark, path: str, snap) -> list[tuple[str, str, str]]:
    """The existence/size probes of :func:`delta_fsck`, distributed:
    live (rel, declared_size) pairs ship in 100k-file chunks, each task
    stats its chunk, and ONLY findings come back — driver memory rides
    the finding count, wall rides files/parallelism."""
    pairs = [
        (rel, int((snap.adds.get(rel) or {}).get("size") or 0))
        for rel, _ in snap.files
    ]
    chunk = 100_000
    tasks = [pairs[i : i + chunk] for i in range(0, len(pairs), chunk)]

    def run(batch):
        from pos_dlt_spark.sources.delta import _abs_file as _af

        out = []
        for rel, declared in batch:
            full = _af(path, rel)  # handles URL-encoding + absolute clones
            try:
                actual = os.path.getsize(full)
            except OSError:
                out.append(("error", "files", f"live file missing on disk: {rel}"))
                continue
            if declared and declared != actual:
                out.append(
                    (
                        "error", "files",
                        f"size mismatch for {rel}: add says {declared}, disk {actual}",
                    )
                )
        return out

    return [
        f
        for part in spark.sparkContext.parallelize(tasks, len(tasks)).map(run).collect()
        for f in part
    ]


def delta_fsck(spark, path: str) -> list[tuple[str, str, str]]:
    """Run every invariant check against the CURRENT snapshot; returns
    the findings list — empty means healthy. Never raises on a finding
    (the point is the report); raises only if the table cannot fold at
    all."""
    from pos_dlt_spark.sources.dv import bitmap_cardinality, read_dv_bytes

    snap = delta_snapshot(spark, path)
    findings: list[tuple[str, str, str]] = []

    def add(sev: str, code: str, msg: str) -> None:
        findings.append((sev, code, msg))

    # -- log chain ---------------------------------------------------------
    from pos_dlt_spark.sources.delta import _list_compacted

    commits, _ = _list_log(os.path.join(path, "_delta_log"))
    covered = set(v for v, _ in commits)
    for s, (e, _p) in _list_compacted(os.path.join(path, "_delta_log")).items():
        covered.update(range(s, e + 1))  # minor compaction covers its span
    versions = sorted(covered)
    if versions:
        base = versions[0]
        want = list(range(base, base + len(versions)))
        if versions != want:
            missing = sorted(set(want) - set(versions))
            add("error", "log", f"version chain has gaps: missing {missing[:5]}")

    # -- live files + stats + partition keys ------------------------------
    phys_parts = [
        snap.physical_names.get(c, c) for c in snap.partition_columns
    ]
    uses_dv = False
    # existence/size probes: two stat syscalls per live file — the one
    # O(files) piece with real I/O. Big tables probe EXECUTOR-side in
    # chunks (only findings return to the driver); the metadata checks
    # below stay in the fold's own cost class either way.
    probe_parallel = len(snap.files) >= FSCK_PARALLEL_MIN
    if probe_parallel:
        findings.extend(_probe_files_parallel(spark, path, snap))
    for rel, _pv in snap.files:
        a = snap.adds.get(rel, {})
        if not probe_parallel:
            full = _abs_file(path, rel)
            if not os.path.exists(full):
                add("error", "files", f"live file missing on disk: {rel}")
            else:
                declared = int(a.get("size") or 0)
                actual = os.path.getsize(full)
                if declared and declared != actual:
                    add(
                        "error", "files",
                        f"size mismatch for {rel}: add says {declared}, disk {actual}",
                    )
        raw = a.get("stats")
        if raw:
            try:
                json.loads(raw) if isinstance(raw, str) else dict(raw)
            except (TypeError, ValueError):
                add("warn", "stats", f"unparseable stats on {rel} (skipping disabled)")
        pv = a.get("partitionValues") or {}
        if sorted(pv.keys()) != sorted(phys_parts):
            add(
                "error", "partition",
                f"partitionValues keys {sorted(pv)} != physical partition "
                f"columns {sorted(phys_parts)} on {rel}",
            )
        dv = a.get("deletionVector")
        if dv:
            uses_dv = True
            try:
                blob = read_dv_bytes(path, dv)
                card = bitmap_cardinality(blob)
                declared_card = int(dv.get("cardinality") or 0)
                if card != declared_card:
                    add(
                        "error", "dv",
                        f"DV cardinality mismatch on {rel}: descriptor says "
                        f"{declared_card}, bitmap decodes {card}",
                    )
            except Exception as e:
                add("error", "dv", f"DV on {rel} does not resolve/decode: {e}")

    # -- protocol coverage -------------------------------------------------
    proto = snap.protocol or {}
    min_r = int(proto.get("minReaderVersion") or 1)
    min_w = int(proto.get("minWriterVersion") or 2)
    rf = set(proto.get("readerFeatures") or ())
    wf = set(proto.get("writerFeatures") or ())

    def reader_covers(feature: str, legacy_reader: int) -> bool:
        return feature in rf or (not rf and min_r >= legacy_reader)

    def writer_covers(feature: str, legacy_writer: int) -> bool:
        return feature in wf or (not wf and min_w >= legacy_writer)

    if uses_dv and not reader_covers("deletionVectors", 3):
        add(
            "error", "protocol",
            "table has live deletion vectors but the protocol declares "
            f"neither the deletionVectors reader feature nor reader>=3 "
            f"(minReaderVersion={min_r}, readerFeatures={sorted(rf)})",
        )
    if snap.column_mapping != "none" and not reader_covers("columnMapping", 2):
        add(
            "error", "protocol",
            f"column mapping '{snap.column_mapping}' in use but protocol "
            f"declares neither the columnMapping feature nor reader>=2",
        )
    gens = any(
        "delta.generationExpression" in (f.metadata or {}) for f in snap.schema.fields
    )
    if gens and not writer_covers("generatedColumns", 4):
        add(
            "warn", "protocol",
            "generated columns declared but protocol does not oblige "
            "writers (writer<4, no generatedColumns feature) — foreign "
            "writers may break the generation invariant",
        )
    idents = any(
        "delta.identity.start" in (f.metadata or {})
        or "delta.identity.step" in (f.metadata or {})
        for f in snap.schema.fields
    )
    if idents and not writer_covers("identityColumns", 6):
        add(
            "warn", "protocol",
            "identity columns declared but protocol does not oblige "
            "writers (writer<6, no identityColumns feature)",
        )

    # -- row tracking ------------------------------------------------------
    from pos_dlt_spark.sources import delta_rowtracking as _rt

    if _rt.row_tracking_enabled(snap.configuration):
        import json as _json

        if not writer_covers("rowTracking", 7):
            add(
                "error", "rowtracking",
                "delta.enableRowTracking set but the protocol does not "
                "declare the rowTracking writer feature",
            )
        hwm = _rt.row_id_high_water_mark(snap)
        spans: list[tuple[int, int, str]] = []
        for rel, _pv in snap.files:
            a = snap.adds.get(rel, {})
            base = a.get("baseRowId")
            if base is None:
                add("error", "rowtracking", f"live file without baseRowId: {rel}")
                continue
            st = a.get("stats")
            vals = (_json.loads(st) if isinstance(st, str) else (st or {})) or {}
            n = vals.get("numRecords")
            if n is None:
                add(
                    "warn", "rowtracking",
                    f"file {rel} has baseRowId but no numRecords stats — "
                    "its id span cannot be validated",
                )
                continue
            spans.append((int(base), int(base) + int(n) - 1, rel))
        spans.sort()
        for (lo1, hi1, r1), (lo2, _hi2, r2) in zip(spans, spans[1:]):
            if lo2 <= hi1:
                add(
                    "error", "rowtracking",
                    f"overlapping fresh-row-id spans: {r1} [{lo1},{hi1}] "
                    f"vs {r2} starting {lo2} — duplicate row ids",
                )
        if spans and spans[-1][1] > hwm:
            add(
                "error", "rowtracking",
                f"rowIdHighWaterMark {hwm} below the highest assigned id "
                f"{spans[-1][1]} — future appends would reuse live ids",
            )

    # -- in-commit timestamps ----------------------------------------------
    if (snap.configuration.get("delta.enableInCommitTimestamps") or "").lower() == "true":
        from pos_dlt_spark.sources.delta import _commit_info

        if not writer_covers("inCommitTimestamp", 7):
            add(
                "error", "ict",
                "delta.enableInCommitTimestamps set but the protocol does "
                "not declare the inCommitTimestamp writer feature",
            )
        enable_v = int(
            snap.configuration.get("delta.inCommitTimestampEnablementVersion")
            or 0
        )
        last: tuple[int, int] | None = None  # (version, ict)
        for v, p in sorted(commits):
            if v < enable_v:
                continue
            ci = _commit_info(p) or {}
            ict = ci.get("inCommitTimestamp")
            if ict is None:
                add(
                    "error", "ict",
                    f"commit {v} (>= enablement version {enable_v}) lacks "
                    "inCommitTimestamp — timestamp time travel is undefined",
                )
                continue
            if last is not None and int(ict) <= last[1]:
                add(
                    "error", "ict",
                    f"inCommitTimestamp not strictly increasing: commit "
                    f"{v} has {ict} <= commit {last[0]}'s {last[1]}",
                )
            last = (v, int(ict))

    # -- clustering --------------------------------------------------------
    from pos_dlt_spark.sources import delta_clustering as _cl

    if snap.domain_metadata.get(_cl.CLUSTERING_DOMAIN):
        if not writer_covers("clustering", 7):
            add(
                "warn", "clustering",
                "clustering domain present but the protocol does not "
                "declare the clustering writer feature — foreign writers "
                "are not obliged to preserve the layout",
            )
        names = {f.name for f in snap.schema.fields}
        bad = sorted(set(_cl.clustering_columns(snap)) - names)
        if bad:
            add(
                "error", "clustering",
                f"clustering columns not in the schema: {bad}",
            )

    # -- column-mapping completeness --------------------------------------
    if snap.column_mapping != "none":
        missing_pn = [
            f.name for f in snap.schema.fields
            if f.name not in snap.physical_names
        ]
        if missing_pn:
            add("error", "mapping", f"columns without physicalName: {missing_pn}")
        if snap.column_mapping == "id":
            missing_id = [
                f.name for f in snap.schema.fields if f.name not in snap.field_ids
            ]
            if missing_id:
                add("error", "mapping", f"columns without field id: {missing_id}")
        pns = list(snap.physical_names.values())
        if len(set(pns)) != len(pns):
            add("error", "mapping", "duplicate physical names in the mapping")

    # -- version checksum (.crc) cross-check -------------------------------
    # validate the NEWEST emitted checksum at or before the snapshot
    # version against a fold at that version — a mismatch means either a
    # corrupted/hand-edited log or a writer whose accounting lied, both
    # worth a loud error; one fold, never O(versions)
    import json as _json

    log_dir = os.path.join(path, "_delta_log")
    crc_versions = sorted(
        int(n[:-4]) for n in os.listdir(log_dir)
        if len(n) == 24 and n.endswith(".crc") and n[:-4].isdigit()
    )
    crc_versions = [v for v in crc_versions if v <= snap.version]
    if crc_versions:
        cv = crc_versions[-1]
        try:
            with open(os.path.join(log_dir, f"{cv:020d}.crc"), encoding="utf-8") as fh:
                crc = _json.load(fh)
            at = snap if cv == snap.version else delta_snapshot(spark, path, cv)
            want_n = len(at.files)
            want_size = sum(
                int(at.adds[rel].get("size") or 0) for rel, _ in at.files
            )
            if int(crc.get("numFiles", -1)) != want_n:
                add(
                    "error", "crc",
                    f"version {cv} checksum numFiles={crc.get('numFiles')} "
                    f"but the fold sees {want_n}",
                )
            if int(crc.get("tableSizeBytes", -1)) != want_size:
                add(
                    "error", "crc",
                    f"version {cv} checksum tableSizeBytes="
                    f"{crc.get('tableSizeBytes')} but the fold sees {want_size}",
                )
            crc_domains = crc.get("domainMetadata")
            if crc_domains is not None and dict(crc_domains) != dict(
                at.domain_metadata
            ):
                add(
                    "error", "crc",
                    f"version {cv} checksum domainMetadata disagrees with "
                    "the fold",
                )
        except (ValueError, OSError) as e:
            add("error", "crc", f"version {cv} checksum unreadable: {e}")

    return findings


__all__ = ["delta_fsck"]
