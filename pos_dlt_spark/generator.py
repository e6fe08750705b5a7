"""Deterministic POS fixture generator — the engine's stand-in for the
reference's data generator (`02_Data Generation.py`), with no cloud
dependencies: instead of replaying to Azure IoT Hub / blob storage
(`02:231-303`), it drops

- dimension CSVs (store / item / inventory_change_type),
- flat inventory-change CSVs (the generator's input form, `02:79-86`),
- nested JSON-lines event files (the Kafka `value` payload form,
  `03:285-296`) written as N incremental files so a file-source stream
  ingests them like arriving micro-batches,
- snapshot CSVs, one file per (store, snapshot-time) like the reference's
  per-store recount drops (`02:128`, `03:339-346`).

Everything is seeded (`random.Random(seed)`) so tests and oracles are
reproducible. Edge cases required by FIXTURES.md are always present:
duplicate (trans_id, item_id) resends within the dedup horizon, an event
with NULL items (explode_outer retention), and an out-of-order older
snapshot (CDC must ignore it).
"""

from __future__ import annotations

import csv
import json
import os
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

TS_FMT = "%Y-%m-%d %H:%M:%S"

STORES = [(1, "store001"), (2, "online")]
CHANGE_TYPES = [(1, "sale"), (2, "restock"), (3, "shrinkage"), (4, "bopis")]


@dataclass
class PosFixtures:
    root: str
    n_items: int = 20
    n_trans: int = 400
    n_event_files: int = 8
    seed: int = 42
    start: datetime = field(default_factory=lambda: datetime(2021, 1, 1, 8, 0, 0))
    days: int = 15

    # populated by generate()
    change_rows: list[tuple] = field(default_factory=list)
    snapshot_rows: list[tuple] = field(default_factory=list)

    def path(self, *parts: str) -> str:
        p = os.path.join(self.root, *parts)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return p

    # -- dimensions --------------------------------------------------------

    def write_dims(self) -> None:
        with open(self.path("dims", "store.csv"), "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["store_id", "name"])
            w.writerows(STORES)
        rng = random.Random(self.seed + 1)
        with open(self.path("dims", "item.csv"), "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["item_id", "name", "supplier_id", "safety_stock_quantity"])
            for i in range(1, self.n_items + 1):
                w.writerow([i, f"item{i:03d}", rng.randint(1, 5), rng.randint(5, 50)])
        with open(self.path("dims", "inventory_change_type.csv"), "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["change_type_id", "change_type"])
            w.writerows(CHANGE_TYPES)

    # -- transactions ------------------------------------------------------

    def gen_transactions(self) -> list[dict]:
        rng = random.Random(self.seed)
        span = timedelta(days=self.days)
        txs = []
        for i in range(self.n_trans):
            ts = self.start + span * (i / self.n_trans) + timedelta(seconds=rng.randint(0, 300))
            store_id = rng.choice([s for s, _ in STORES])
            change_type_id = rng.choices([1, 2, 3, 4], weights=[70, 15, 5, 10])[0]
            n_items = rng.randint(1, 3) if change_type_id != 2 else rng.randint(2, 5)
            items = []
            chosen = rng.sample(range(1, self.n_items + 1), n_items)
            for item_id in chosen:
                qty = -rng.randint(1, 4) if change_type_id in (1, 4) else rng.randint(1, 25)
                if change_type_id == 3:
                    qty = -rng.randint(1, 2)
                items.append({"item_id": item_id, "quantity": qty})
            txs.append(
                {
                    "trans_id": f"{{{rng.getrandbits(64):016x}}}",  # braces like the raw GUIDs
                    "store_id": store_id,
                    "date_time": ts.strftime(TS_FMT),
                    "change_type_id": change_type_id,
                    "items": items,
                }
            )
        txs.sort(key=lambda t: (t["date_time"], t["trans_id"]))
        return txs

    # -- flat change CSVs (generator input form, braces kept) --------------

    def write_change_csvs(self, txs: list[dict]) -> None:
        by_store: dict[int, list] = {s: [] for s, _ in STORES}
        for t in txs:
            for it in t["items"]:
                row = (
                    t["trans_id"],
                    it["item_id"],
                    t["store_id"],
                    t["date_time"],
                    it["quantity"],
                    t["change_type_id"],
                )
                by_store[t["store_id"]].append(row)
                self.change_rows.append(row)
        for store_id, rows in by_store.items():
            with open(self.path("changes", f"store{store_id}.csv"), "w", newline="") as fh:
                w = csv.writer(fh)
                w.writerow(["trans_id", "item_id", "store_id", "date_time", "quantity", "change_type_id"])
                w.writerows(rows)

    # -- nested JSON event files (Kafka value payloads) --------------------

    def write_event_files(self, txs: list[dict]) -> None:
        """Emit events as JSON-lines across n_event_files, preserving
        date_time order (reference replays in event-time order, 02:112).

        Injected edge cases:
        - every 20th transaction is re-sent split per-item (the oversize-
          message fragmentation of 02:288-296) -> duplicate
          (trans_id, item_id) pairs the silver dedup must collapse;
        - one header-only event with items=null per file batch.
        """
        rng = random.Random(self.seed + 2)
        chunks = [txs[i :: self.n_event_files] for i in range(self.n_event_files)]
        # keep file ordering aligned with time: round-robin split then sort
        flat = sorted(txs, key=lambda t: (t["date_time"], t["trans_id"]))
        per = max(1, len(flat) // self.n_event_files)
        chunks = [flat[i * per : (i + 1) * per] for i in range(self.n_event_files - 1)]
        chunks.append(flat[(self.n_event_files - 1) * per :])
        for fi, chunk in enumerate(chunks):
            lines = []
            for ti, t in enumerate(chunk):
                msg = dict(t)
                msg["trans_id"] = msg["trans_id"].strip("{}")
                lines.append(json.dumps(msg))
                if (fi * per + ti) % 20 == 19:
                    # duplicate resend, split one message per item
                    for it in t["items"]:
                        frag = dict(msg)
                        frag["items"] = [it]
                        lines.append(json.dumps(frag))
            if chunk:
                null_items = {
                    "trans_id": f"hdronly{fi:04d}",
                    "store_id": rng.choice([s for s, _ in STORES]),
                    "date_time": chunk[-1]["date_time"],
                    "change_type_id": 1,
                    "items": None,
                }
                lines.append(json.dumps(null_items))
            with open(self.path("events", f"batch_{fi:04d}.json"), "w") as fh:
                fh.write("\n".join(lines) + "\n")

    # -- snapshots ---------------------------------------------------------

    def write_snapshots(self) -> None:
        """Per-store full recounts every ~5 days + one out-of-order older
        snapshot file for a key that already has a newer one."""
        rng = random.Random(self.seed + 3)
        snap_times = [self.start + timedelta(days=d, hours=22) for d in range(0, self.days, 5)]
        fi = 0
        for snap_ts in snap_times:
            for store_id, _ in STORES:
                rows = []
                for item_id in range(1, self.n_items + 1):
                    rows.append(
                        (
                            item_id,
                            rng.randint(100, 120),  # employee_id
                            store_id,
                            snap_ts.strftime(TS_FMT),
                            rng.randint(0, 60),
                        )
                    )
                self.snapshot_rows.extend(rows)
                with open(self.path("snapshots", f"snap_{fi:04d}.csv"), "w", newline="") as fh:
                    w = csv.writer(fh)
                    w.writerow(["id", "item_id", "employee_id", "store_id", "date_time", "quantity"])
                    for rid, r in enumerate(rows):
                        w.writerow([rid, *r])
                fi += 1
        # out-of-order: an OLDER snapshot for store 1 landing in the last file
        old_ts = (self.start - timedelta(days=1)).strftime(TS_FMT)
        rows = [(item_id, 99, 1, old_ts, 999) for item_id in range(1, self.n_items + 1)]
        self.snapshot_rows.extend(rows)
        with open(self.path("snapshots", f"snap_{fi:04d}.csv"), "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["id", "item_id", "employee_id", "store_id", "date_time", "quantity"])
            for rid, r in enumerate(rows):
                w.writerow([rid, *r])

    def generate(self) -> "PosFixtures":
        self.write_dims()
        txs = self.gen_transactions()
        self.write_change_csvs(txs)
        self.write_event_files(txs)
        self.write_snapshots()
        return self
