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

import datetime as _dt
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """LATEST moved between read and commit — retry on a fresh read.

    A retry is always productive: if the conflict came from a crashed
    writer's orphaned v-file (created but never published), the losing
    commit ADOPTS it — finishes the crashed writer's LATEST swap — so
    the retry sees an advanced table instead of hitting the same
    orphan forever (the round-4 wedge)."""


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


def _json_scalar(v):
    """Parquet-footer stat → JSON-safe, order-preserving scalar.

    Timestamps map to epoch microseconds (the engine's µs convention)
    so bounds compare as plain ints; bytes decode best-effort."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (bool, int, float, str)):
        return v
    return None


def _file_column_stats(path: str) -> dict[str, list]:
    """Per-file {column: [min, max]} from the parquet FOOTER only —
    no data pages are read. This is the snapshot-log analogue of
    Iceberg's per-data-file column bounds (lower_bounds/upper_bounds),
    the metadata that lets a 100 TB scan skip files driver-side
    (reference analog: the FITS header-only catalog pass,
    src/tools/generate_catalog_from_fits.py:49-50).

    Columns with missing/unusable stats in ANY row group are omitted
    (absence = "don't prune on this file"), so pruning stays sound for
    truncated string stats or stats-less writers."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    schema = md.schema
    bounds: dict[str, list] = {}
    dead: set[str] = set()
    for rg in range(md.num_row_groups):
        grp = md.row_group(rg)
        for ci in range(grp.num_columns):
            col = grp.column(ci)
            name = schema.column(ci).name
            if name in dead or "." in col.path_in_schema:
                continue  # nested leaves prune nothing useful
            st = col.statistics
            if st is None or not st.has_min_max:
                dead.add(name)
                bounds.pop(name, None)
                continue
            lo, hi = _json_scalar(st.min), _json_scalar(st.max)
            if lo is None or hi is None:
                dead.add(name)
                bounds.pop(name, None)
                continue
            if name in bounds:
                bounds[name][0] = min(bounds[name][0], lo)
                bounds[name][1] = max(bounds[name][1], hi)
            else:
                bounds[name] = [lo, hi]
    return bounds


def _norm_bound(v):
    """Normalise a caller-supplied pruning bound like _json_scalar."""
    out = _json_scalar(v)
    if out is None:
        raise TypeError(f"unsupported pruning bound type: {type(v).__name__}")
    return out


def _entry_survives(entry: dict, stats_filter: dict) -> bool:
    """False only when the file's footer bounds PROVE no row matches.

    Files without stats for a column always survive — pruning is an
    optimisation, never a correctness gate; callers still apply the
    real row-level filter on the scan."""
    stats = entry.get("stats") or {}
    for col, (lo, hi) in stats_filter.items():
        b = stats.get(col)
        if b is None:
            continue
        fmin, fmax = b
        if lo is not None and fmax < _norm_bound(lo):
            return False
        if hi is not None and fmin > _norm_bound(hi):
            return False
    return True


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

    new_entries, summary = _write_data_files(table_dir, df, partition)

    if operation == "append" and expected_snapshot_id is not None:
        parent = _load_snapshot(table_dir, expected_snapshot_id)
        manifest = parent["manifest"] + new_entries
    elif operation in ("append", "overwrite"):
        manifest = new_entries
    else:
        raise ValueError(f"unknown operation: {operation}")

    return _commit_snapshot(
        table_dir,
        manifest,
        operation,
        expected_snapshot_id,
        {**summary, "partition": partition},
    )


def _write_data_files(
    table_dir: str, df: DataFrame, partition: str | None
) -> tuple[list[dict], dict]:
    """Write ``df`` as immutable parquet files under a fresh per-commit
    directory; return (manifest entries with footer stats, lineage
    summary of what LANDED). Timestamps are forced to TIMESTAMP_MICROS
    for this write even under a foreign session: INT96 (the legacy
    default) has no footer min/max, which would silently disable ts
    data skipping on every file this table ever commits."""
    files_dir = os.path.join(table_dir, "data", uuid.uuid4().hex)
    conf = df.sparkSession.conf
    prev_ts_type = conf.get("spark.sql.parquet.outputTimestampType")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        df.write.parquet(files_dir)
    finally:
        conf.set("spark.sql.parquet.outputTimestampType", prev_ts_type)
    new_files = sorted(
        os.path.join(files_dir, f)
        for f in os.listdir(files_dir)
        if f.endswith(".parquet")
    )
    new_entries = [
        {"path": p, "partition": partition, "stats": _file_column_stats(p)}
        for p in new_files
    ]
    # summarize what LANDED (columnar re-scan of the new files), not the
    # input plan — a plan re-run would double-execute expensive lineage
    # (joins, LSH) and could observe different data on a live source
    summary = _lineage_summary(df.sparkSession.read.parquet(files_dir))
    return new_entries, summary


def compact(
    spark: SparkSession,
    table_dir: str,
    partition: str | None = None,
    target_partitions: int = 1,
) -> int | None:
    """Small-file compaction (Iceberg's ``rewrite_data_files``): rewrite
    the live files of one ``partition`` tag (or the whole live set)
    into ``target_partitions`` output files, committed as one atomic
    ``compact`` snapshot whose manifest keeps every untouched entry.

    Content-preserving by construction (the commit summary re-checksums
    what landed; the test asserts checksum equality with the
    pre-compaction snapshot), CAS-protected against concurrent writers,
    and time travel to pre-compaction snapshots keeps working because
    data files are immutable — old snapshots still reference the old
    files until :func:`expire_snapshots` retires them.

    Returns the new snapshot id, or None when the group already has
    ≤1 file (nothing to compact). At 100 TB this is the maintenance
    job that keeps scan task counts sane after many small streaming /
    per-bucket appends (reference analog: the reference re-batches
    per-chunk outputs into one catalog, SURVEY §2.1 S4/S5)."""
    sid = current_snapshot_id(table_dir)
    if sid is None:
        return None
    entries = _load_snapshot(table_dir, sid)["manifest"]
    group = [
        e for e in entries if partition is None or e["partition"] == partition
    ]
    if len(group) <= 1:
        return None
    keep = [e for e in entries if e not in group]
    df = spark.read.parquet(*[e["path"] for e in group]).repartition(
        max(1, int(target_partitions))
    )
    new_entries, summary = _write_data_files(table_dir, df, partition)
    return _commit_snapshot(
        table_dir,
        keep + new_entries,
        "compact",
        sid,
        {
            **summary,
            "partition": partition,
            "rewrote_files": len(group),
            "into_files": len(new_entries),
        },
    )


def expire_snapshots(
    table_dir: str,
    keep_last: int = 1,
    delete_orphans: bool = False,
    orphan_grace_s: float = 3600.0,
) -> dict:
    """Retire history (Iceberg's ``expire_snapshots`` +
    ``remove_orphan_files``): drop all but the ``keep_last`` most
    recent snapshots and DELETE data files referenced only by the
    dropped ones. With ``delete_orphans``, also remove data files
    referenced by NO snapshot at all (crashed writers' leftovers)
    once older than ``orphan_grace_s`` — the grace window keeps an
    in-flight commit's freshly written files safe.

    Time travel contracts shrink explicitly: reads of an expired
    snapshot raise, reads of every retained snapshot are untouched
    (their files are never deleted). Returns counts for the audit
    trail."""
    sd = _snap_dir(table_dir)
    snaps = sorted(
        n for n in os.listdir(sd) if n.startswith("v") and n.endswith(".json")
    )
    keep_last = max(1, int(keep_last))
    drop, keep = snaps[:-keep_last], snaps[-keep_last:]
    live: set[str] = set()
    for name in keep:
        with open(os.path.join(sd, name)) as f:
            live.update(e["path"] for e in json.load(f)["manifest"])
    removed_files = 0
    for name in drop:
        with open(os.path.join(sd, name)) as f:
            for e in json.load(f)["manifest"]:
                if e["path"] not in live and os.path.exists(e["path"]):
                    os.unlink(e["path"])
                    removed_files += 1
        os.unlink(os.path.join(sd, name))
    removed_orphans = 0
    if delete_orphans:
        referenced = set(live)
        for name in os.listdir(sd):
            if name.startswith("v") and name.endswith(".json"):
                with open(os.path.join(sd, name)) as f:
                    referenced.update(
                        e["path"] for e in json.load(f)["manifest"]
                    )
        data_root = os.path.join(table_dir, "data")
        now = time.time()
        if os.path.isdir(data_root):
            for dirpath, _dirs, files in os.walk(data_root):
                for fn in files:
                    p = os.path.join(dirpath, fn)
                    if (
                        fn.endswith(".parquet")
                        and p not in referenced
                        and now - os.path.getmtime(p) > orphan_grace_s
                    ):
                        os.unlink(p)
                        removed_orphans += 1
    return {
        "expired_snapshots": len(drop),
        "removed_files": removed_files,
        "removed_orphans": removed_orphans,
    }


def _commit_snapshot(
    table_dir: str,
    manifest: list[dict],
    operation: str,
    expected_snapshot_id: int | None,
    summary: dict,
) -> int:
    """CAS-publish a snapshot whose manifest is already assembled.

    Two writers racing from the same parent target the SAME v-file;
    O_EXCL creation makes exactly one win (the loser gets
    FileExistsError → CommitConflict) — the manifest file itself is
    the compare-and-swap token, as in Iceberg's metadata commit."""
    snap_id = (expected_snapshot_id or 0) + 1
    snap = {
        "snapshot_id": snap_id,
        "parent_id": expected_snapshot_id,
        "operation": operation,
        "committed_at": time.time(),
        "manifest": manifest,
        "summary": summary,
    }
    snap_path = os.path.join(_snap_dir(table_dir), f"v{snap_id:08d}.json")

    if current_snapshot_id(table_dir) != expected_snapshot_id:
        raise CommitConflict(
            f"table advanced past snapshot {expected_snapshot_id}"
        )
    # Atomic-BY-CONTENT v-file creation (round-5 ADVICE): the manifest
    # is json.dump-ed into a private tmp file first and os.link(2) is
    # the compare-and-swap — link fails with FileExistsError if the
    # v-file already exists, and a v-file that exists is ALWAYS
    # complete JSON. The previous O_EXCL-then-dump protocol could leave
    # a partial husk on crash mid-dump, and a writer stalled >grace
    # between create and close could have its inode unlinked under it
    # by the husk-clear path (LATEST then pointing at nothing, or a
    # silently lost commit). Under this protocol no live writer ever
    # holds snap_path open, so the husk-clear in _adopt_orphan (kept
    # for files left by pre-upgrade writers or external corruption) can
    # no longer race anyone.
    tmp_snap = snap_path + f".tmp.{uuid.uuid4().hex}"
    with open(tmp_snap, "w") as f:
        json.dump(snap, f)
    try:
        os.link(tmp_snap, snap_path)
    except FileExistsError as e:
        # The v-file exists but we read LATEST == parent above. Either a
        # live racer linked it microseconds ago and is about to publish,
        # or a writer CRASHED between link and the LATEST swap, leaving
        # an orphan that would conflict every future commit from this
        # parent forever (the round-4 wedge). Resolve by HELPING: finish
        # the other writer's publication ourselves, then conflict so OUR
        # data retries against the advanced table. The swap is idempotent
        # (same content) if the racer is alive and publishes too.
        _adopt_orphan(table_dir, snap_path, snap_id, expected_snapshot_id)
        raise CommitConflict(
            f"concurrent commit already produced snapshot {snap_id}; "
            "adopted it into LATEST — retry on a fresh read"
        ) from e
    finally:
        try:
            os.unlink(tmp_snap)
        except FileNotFoundError:
            pass
    tmp = _latest_path(table_dir) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"snapshot_id": snap_id}, f)
    os.replace(tmp, _latest_path(table_dir))  # POSIX-atomic publish
    return snap_id


def _adopt_orphan(
    table_dir: str, snap_path: str, snap_id: int, parent_id: int | None
) -> None:
    """Publish (or clear) a v-file whose writer never swapped LATEST.

    Three cases, all safe under a live racer:

    - Valid JSON → advance LATEST to it (idempotent with the racer's
      own publish: byte-identical content, atomic ``os.replace``).
    - Unparseable AND stale (mtime older than the grace window) →
      unlink the husk so the next retry's link-CAS can win. Since the
      round-6 atomic-by-content protocol, this engine can no longer
      produce husks (v-files are linked complete) and no live writer
      ever holds ``snap_path`` open — the branch only clears files left
      by pre-upgrade writers or external corruption, race-free.
    - Unparseable but FRESH → grace-window caution; leave it alone (a
      later stale pass resolves it).
    """
    grace_s = 10.0
    try:
        with open(snap_path) as f:
            orphan = json.load(f)
    except FileNotFoundError:
        return  # already resolved by someone else
    except (json.JSONDecodeError, ValueError):
        try:
            if time.time() - os.path.getmtime(snap_path) > grace_s:
                os.unlink(snap_path)
        except FileNotFoundError:
            pass
        return
    if orphan.get("snapshot_id") != snap_id:
        return
    if current_snapshot_id(table_dir) != parent_id:
        return  # LATEST already advanced — nothing to finish
    tmp = _latest_path(table_dir) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"snapshot_id": snap_id}, f)
    os.replace(tmp, _latest_path(table_dir))


def resolve_files(
    table_dir: str,
    snapshot_id: int | None = None,
    partition: str | None = None,
    stats_filter: dict | None = None,
) -> list[str]:
    """Driver-side file resolution: manifest entries surviving the
    ``partition`` tag filter AND the column-stats ``stats_filter``.

    ``stats_filter`` maps column → ``(lo, hi)`` inclusive bounds
    (either side may be None for unbounded). A file is skipped only
    when its parquet-footer min/max PROVE no row can match — the
    Iceberg data-skipping contract. Exposed separately from
    :func:`read_table` so tests and planners can assert exactly which
    files a bounded read would open."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(table_dir)
    if sid is None:
        raise FileNotFoundError(f"no snapshots in {table_dir}")
    entries = _load_snapshot(table_dir, sid)["manifest"]
    if partition is not None:
        entries = [e for e in entries if e["partition"] == partition]
    if stats_filter:
        entries = [e for e in entries if _entry_survives(e, stats_filter)]
    return [e["path"] for e in entries]


def read_table(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    partition: str | None = None,
    stats_filter: dict | None = None,
) -> DataFrame:
    """Read the table exactly as of ``snapshot_id`` (default: LATEST).

    ``partition`` prunes manifest entries driver-side before the scan;
    ``stats_filter`` ({column: (lo, hi)}) additionally skips files
    whose footer min/max prove no match. Pruning is an optimisation:
    surviving files may still hold non-matching rows, so callers apply
    the real row-level predicate too (exactly as with Iceberg scans —
    the predicate both prunes files and filters rows)."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(table_dir)
    paths = resolve_files(table_dir, sid, partition, stats_filter)
    if not paths:
        if stats_filter:
            # a stats-filter can legitimately prune everything; give the
            # caller an empty frame with the right schema instead of an
            # error (all = unpruned file set, read schema-only)
            all_paths = resolve_files(table_dir, sid, partition)
            return spark.read.parquet(*all_paths).limit(0)
        raise FileNotFoundError(
            f"snapshot {sid} has no files for partition {partition!r}"
        )
    return spark.read.parquet(*paths)
