"""Per-partition lineage + checkpoint-resume (the incremental engine).

Graft analogue of the reference's ledgers and pending-session
checkpoint: ``trained_spectra.csv`` append-only consumption log
(reference: src/tools/dataset_builder.py:228-268), the resumable
download queue (src/tools/dr5_downloader.py:268-300) and the
pending-session JSON that lets a killed run resume without recompute
(src/pipeline/master.py:669-760).

Design (Iceberg-shaped, parquet-backed here since no Iceberg runtime
jar ships in this sandbox):

- work is split into ``n_buckets`` hash buckets of ``conv_id``
  (``pmod(xxhash64(conv_id), n)``) — at cluster scale each bucket is an
  Iceberg partition and the per-bucket write is an atomic snapshot
  commit;
- the input is scanned exactly ONCE per run: a pre-stage pass writes it
  partitioned by ``_bucket`` (hash buckets are not derivable by the
  scan, so a per-bucket filter on the raw source would re-scan the
  full table once per bucket — 64 full reads of 100 TB); each bucket
  then reads only its own partition directory (partition pruning,
  plan-audited in tests). The stage is reused on resume (its
  ``_SUCCESS`` marker is the commit);
- each bucket commit appends one lineage record
  ``(run_id, bucket, n_rows, checksum, input_rows, input_checksum,
  status)`` to the lineage table *after* its output partition lands —
  crash between the two ⇒ the bucket is simply recomputed (output
  overwrite is idempotent);
- resume = anti-join the bucket list against committed lineage records
  (the reference's ``new = available − already_used``,
  src/tools/dataset_builder.py:197-205);
- checksums are order-insensitive ``bit_xor(xxhash64(row))`` so
  re-partitioned recomputes verify equal;
- failures are counted and recorded, never silently dropped (the
  reference silently drops failed spectra —
  src/pipeline/processing.py:218-219,446 — we explicitly do not).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astrospectro_spark.engine.windows import featurize_expr

LINEAGE_SCHEMA = (
    "run_id string, bucket int, status string, n_rows long, checksum long, "
    "input_rows long, input_checksum long"
)


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


def bucketize(df: DataFrame, n_buckets: int) -> DataFrame:
    """Attach the engine's hash-bucket column.

    Pre-staging contract: a table written
    ``bucketize(df, n).write.partitionBy("_bucket")`` (or an Iceberg
    table with the equivalent bucket transform) read back and passed to
    :meth:`FeatureRun.run` skips the staging copy entirely — the
    per-bucket filter partition-prunes the source directly, so a run
    over an already-bucket-laid-out 100 TB table does ZERO extra
    write+read. ``n_buckets`` must equal the FeatureRun's."""
    return df.withColumn("_bucket", _bucket_col(n_buckets))


def _checksum(df: DataFrame) -> tuple[int, int]:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.expr(
                "bit_xor(xxhash64(" + ", ".join(f"`{c}`" for c in df.columns) + "))"
            ),
            F.lit(0),
        ).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


class FeatureRun:
    """A resumable featurization run over a transcripts table."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        n_buckets: int = 16,
        featurizer=featurize_expr,
        run_id: str = "run-0",
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.featurizer = featurizer
        self.run_id = run_id
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        self.data_dir = os.path.join(out_dir, "features")
        self.stage_dir = os.path.join(out_dir, "_staged")

    # -- lineage table ------------------------------------------------
    def lineage(self) -> DataFrame:
        try:
            return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.lineage_dir)
        except Exception:  # noqa: BLE001 — no lineage yet
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)

    def committed_buckets(self) -> set[int]:
        return {
            r.bucket
            for r in self.lineage().filter(F.col("status") == "committed").collect()
        }

    def _append_lineage(self, **kw) -> None:
        row = (
            kw["run_id"],
            kw["bucket"],
            kw["status"],
            kw["n_rows"],
            kw["checksum"],
            kw["input_rows"],
            kw["input_checksum"],
        )
        self.spark.createDataFrame([row], LINEAGE_SCHEMA).write.mode("append").parquet(
            self.lineage_dir
        )

    # -- staging --------------------------------------------------------
    def _stage(self, turns: DataFrame) -> DataFrame:
        """Write the input ONCE, partitioned by hash bucket; reuse on
        resume. Returns the staged frame, whose per-bucket filter is a
        partition-pruned directory read instead of a full-table scan.

        The staged copy is keyed to this out_dir. A row-count
        fingerprint is written next to the ``_SUCCESS`` marker at stage
        time; resuming with an input whose row count differs FAILS
        LOUDLY instead of silently mixing buckets from two different
        inputs (parquet counts are footer-metadata reads, so the resume
        check is ~free). A same-count different-content input evades
        this cheap check — pass ``verify_input=True`` to
        :meth:`run` for a full per-bucket checksum audit against the
        lineage records."""
        marker = os.path.join(self.stage_dir, "_SUCCESS")
        fp_path = os.path.join(self.stage_dir, "_fingerprint.json")
        # Explicit read schema: a 0-row input (drained resume queue,
        # partition-pruned read matching nothing) writes a staged dir
        # with no data files, and schema inference on it throws.
        staged_schema = turns.withColumn("_bucket", _bucket_col(self.n_buckets)).schema
        if not os.path.exists(marker):
            turns.withColumn("_bucket", _bucket_col(self.n_buckets)).write.mode(
                "overwrite"
            ).partitionBy("_bucket").parquet(self.stage_dir)
            staged = self.spark.read.schema(staged_schema).parquet(self.stage_dir)
            with open(fp_path, "w") as f:
                json.dump({"input_rows": staged.count()}, f)
            return staged
        staged = self.spark.read.schema(staged_schema).parquet(self.stage_dir)
        if os.path.exists(fp_path):
            with open(fp_path) as f:
                want = json.load(f)["input_rows"]
            got = turns.count()
            if got != want:
                raise ValueError(
                    f"resume with a different input: staged snapshot holds {want} "
                    f"rows but the passed input has {got}; use a fresh out_dir "
                    f"for a new or updated input table"
                )
        return staged

    def _verify_committed(self, staged: DataFrame, done: set[int]) -> None:
        """Full-content audit (opt-in): recompute each committed
        bucket's INPUT checksum from the current (staged or
        pre-bucketed) frame and compare with the lineage record — a
        changed input that kept its row count fails here."""
        recorded = {
            r.bucket: (r.input_rows, r.input_checksum)
            for r in self.lineage().filter(F.col("status") == "committed").collect()
        }
        for b in sorted(done):
            got = _checksum(staged.filter(F.col("_bucket") == b).drop("_bucket"))
            if got != recorded.get(b):
                raise ValueError(
                    f"bucket {b}: input content changed since commit "
                    f"(recorded {recorded.get(b)}, recomputed {got}); "
                    f"use a fresh out_dir for a new input table"
                )

    # -- run / resume ---------------------------------------------------
    def run(
        self,
        turns: DataFrame,
        fail_after: int | None = None,
        verify_input: bool = False,
    ) -> dict:
        """Process all not-yet-committed buckets; idempotent.

        If ``turns`` already carries a ``_bucket`` column (a
        pre-bucketed table, see :func:`bucketize`) the staging copy is
        SKIPPED — the per-bucket filter prunes the source layout
        directly and the run does zero extra write at any scale.

        ``fail_after=k`` injects a crash after k bucket commits (test
        hook for the kill-and-resume audit). ``verify_input=True``
        additionally re-checksums every already-committed bucket's
        input against its lineage record before resuming (full read of
        the committed partitions; off by default).
        """
        done = self.committed_buckets()
        todo = [b for b in range(self.n_buckets) if b not in done]
        prestaged = "_bucket" in turns.columns
        staged = turns if prestaged else (self._stage(turns) if todo else None)
        if verify_input and done and staged is not None:
            self._verify_committed(staged, done)
        n_done = 0
        for b in todo:
            if fail_after is not None and n_done >= fail_after:
                raise RuntimeError(f"injected failure after {n_done} buckets")
            part = staged.filter(F.col("_bucket") == b).drop("_bucket")
            in_rows, in_sum = _checksum(part)
            feats = self.featurizer(part)
            bucket_path = os.path.join(self.data_dir, f"bucket={b}")
            feats.write.mode("overwrite").parquet(bucket_path)
            # release any hot-slice cache the salted featurizer pinned —
            # a 64-bucket run must not accumulate 64 cached slices
            from astrospectro_spark.engine.skew import release_cached

            release_cached(feats)
            out = self.spark.read.parquet(bucket_path)
            n_rows, checksum = _checksum(out)
            self._append_lineage(
                run_id=self.run_id,
                bucket=b,
                status="committed",
                n_rows=n_rows,
                checksum=checksum,
                input_rows=in_rows,
                input_checksum=in_sum,
            )
            n_done += 1
        return {
            "buckets_total": self.n_buckets,
            "buckets_skipped": len(done),
            "buckets_processed": n_done,
        }

    def result(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.data_dir, "bucket=*"))
