"""Snapshot-log table format: Iceberg-SHAPED commit semantics on plain
parquet, for environments without an Iceberg runtime jar (SURVEY
§1.1.4; this sandbox ships none — ``engine/lineage.py`` documents the
gap, this module closes the semantic half of it honestly).

This is NOT Iceberg and does not claim wire compatibility. It
reimplements the three properties the engine's resume/lineage story
needs from a table format, with the same mechanics Iceberg uses:

1. **Atomic commits via a snapshot log.** Data files are immutable,
   written to a per-commit directory; a commit is one JSON manifest
   (`_snapshots/v<NNNN>.json`) listing the table's COMPLETE file set,
   plus an atomic swap of the `_snapshots/LATEST` pointer
   (`os.replace`, atomic on POSIX). Readers never see a partial
   commit: they resolve LATEST (or an explicit snapshot id) and read
   exactly that manifest's files.
2. **Optimistic concurrency.** A commit records the parent snapshot it
   was based on; if LATEST moved since the writer read it, the commit
   raises ``CommitConflict`` instead of clobbering — the caller
   retries on a fresh read (Iceberg's compare-and-swap on the
   metadata pointer).
3. **Time travel + lineage.** Every snapshot carries
   ``(snapshot_id, parent_id, operation, summary)`` where summary
   holds the engine's lineage facts (row count, order-insensitive
   checksum); ``read_table(..., snapshot_id=...)`` reproduces any
   historical state, and ``history()`` is the lineage audit trail.

Operations: ``append`` (new files join the live set) and
``overwrite`` (new files REPLACE the live set — the compaction /
dedup-rewrite primitive). Orphaned files from failed or superseded
commits are unreferenced by construction and ignored by readers.

At cluster scale the manifest lists thousands of files; the JSON
stays KB-MB sized because it stores paths + stats, not data — the
same reason Iceberg metadata scales. Partition pruning here is
path-prefix filtering over manifest entries (each append may declare
a ``partition`` tag), resolved driver-side before the parquet scan.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """LATEST moved between read and commit — retry on a fresh read."""


def _snap_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_snapshots")


def _latest_path(table_dir: str) -> str:
    return os.path.join(_snap_dir(table_dir), "LATEST")


def current_snapshot_id(table_dir: str) -> int | None:
    """The committed snapshot id, or None for an empty/new table."""
    try:
        with open(_latest_path(table_dir)) as f:
            return int(json.load(f)["snapshot_id"])
    except FileNotFoundError:
        return None


def _load_snapshot(table_dir: str, snapshot_id: int) -> dict:
    with open(os.path.join(_snap_dir(table_dir), f"v{snapshot_id:08d}.json")) as f:
        return json.load(f)


def history(table_dir: str) -> list[dict]:
    """All snapshots, oldest first — the table's lineage audit trail."""
    sd = _snap_dir(table_dir)
    if not os.path.isdir(sd):
        return []
    out = []
    for name in sorted(os.listdir(sd)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(sd, name)) as f:
                out.append(json.load(f))
    return out


def _lineage_summary(df: DataFrame) -> dict:
    """Row count + order-insensitive checksum (same convention as the
    lineage ledger: bit_xor of xxhash64 over all columns)."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])), F.lit(0)
        ).alias("chk"),
    ).first()
    return {"n_rows": int(row["n"]), "checksum": int(row["chk"])}


def commit(
    table_dir: str,
    df: DataFrame,
    operation: str = "append",
    partition: str | None = None,
    expected_snapshot_id: int | None = ...,
) -> int:
    """Write ``df`` as immutable files and commit them atomically.

    ``operation``: ``"append"`` adds the files to the live set;
    ``"overwrite"`` replaces the whole live set (compaction /
    dedup-rewrite). ``partition`` tags the new files for driver-side
    pruning in :func:`read_table`. ``expected_snapshot_id`` pins the
    parent for optimistic concurrency; the default (ellipsis) snapshots
    LATEST at entry — pass the id you planned against to detect
    concurrent writers across a longer span.
    """
    if expected_snapshot_id is ...:
        expected_snapshot_id = current_snapshot_id(table_dir)
    os.makedirs(_snap_dir(table_dir), exist_ok=True)

    files_dir = os.path.join(table_dir, "data", uuid.uuid4().hex)
    df.write.parquet(files_dir)
    new_files = sorted(
        os.path.join(files_dir, f)
        for f in os.listdir(files_dir)
        if f.endswith(".parquet")
    )
    new_entries = [{"path": p, "partition": partition} for p in new_files]
    # summarize what LANDED (columnar re-scan of the new files), not the
    # input plan — a plan re-run would double-execute expensive lineage
    # (joins, LSH) and could observe different data on a live source
    summary = _lineage_summary(df.sparkSession.read.parquet(files_dir))

    if operation == "append" and expected_snapshot_id is not None:
        parent = _load_snapshot(table_dir, expected_snapshot_id)
        manifest = parent["manifest"] + new_entries
    elif operation in ("append", "overwrite"):
        manifest = new_entries
    else:
        raise ValueError(f"unknown operation: {operation}")

    snap_id = (expected_snapshot_id or 0) + 1
    snap = {
        "snapshot_id": snap_id,
        "parent_id": expected_snapshot_id,
        "operation": operation,
        "committed_at": time.time(),
        "manifest": manifest,
        "summary": {**summary, "partition": partition},
    }
    snap_path = os.path.join(_snap_dir(table_dir), f"v{snap_id:08d}.json")

    # CAS: two writers racing from the same parent target the SAME
    # v-file; O_EXCL creation makes exactly one win (the loser gets
    # FileExistsError → CommitConflict) — the manifest file itself is
    # the compare-and-swap token, as in Iceberg's metadata commit.
    if current_snapshot_id(table_dir) != expected_snapshot_id:
        raise CommitConflict(
            f"table advanced past snapshot {expected_snapshot_id}"
        )
    try:
        with open(snap_path, "x") as f:
            json.dump(snap, f)
    except FileExistsError as e:
        raise CommitConflict(
            f"concurrent commit already produced snapshot {snap_id}"
        ) from e
    tmp = _latest_path(table_dir) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"snapshot_id": snap_id}, f)
    os.replace(tmp, _latest_path(table_dir))  # POSIX-atomic publish
    return snap_id


def read_table(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    partition: str | None = None,
) -> DataFrame:
    """Read the table exactly as of ``snapshot_id`` (default: LATEST).
    ``partition`` prunes manifest entries driver-side before the scan."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(table_dir)
    if sid is None:
        raise FileNotFoundError(f"no snapshots in {table_dir}")
    snap = _load_snapshot(table_dir, sid)
    entries = snap["manifest"]
    if partition is not None:
        entries = [e for e in entries if e["partition"] == partition]
    paths = [e["path"] for e in entries]
    if not paths:
        raise FileNotFoundError(
            f"snapshot {sid} has no files for partition {partition!r}"
        )
    return spark.read.parquet(*paths)
