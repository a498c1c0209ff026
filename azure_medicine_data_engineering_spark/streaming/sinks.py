"""Incremental materialization sinks: foreachBatch keyed upsert.

Scale extension (SURVEY §2.9): the production pattern for maintaining a
queryable aggregate table from a stream — update-mode aggregation +
``foreachBatch`` merging each micro-batch into a keyed state table. The
reference's closest surface is its overwrite-table publish step
(``utils.scala:164-170``); this is the streaming equivalent that never
recomputes history.

Merge semantics: in update mode each micro-batch emits the NEW cumulative
aggregate row for every key touched in that batch, so the upsert is
"replace touched keys, keep the rest". State versions are written to
``state/v{batch_id}`` (write-new-then-point, never read-and-overwrite the
same files — self-overwrite corrupts a lazily-read source). A production
deployment swaps the versioned-directory device for a transactional table
format (Delta/Iceberg MERGE); the micro-batch dataflow is identical.

At 100 TB: the state table is keyed-aggregate-sized (users, not events);
the anti-join + union per batch shuffles only state ∪ batch on the key,
and the stream side is bounded by the state store, not history.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.streaming.windows import (
    read_events_stream,
)


def merge_state(
    spark: SparkSession,
    prev_path: str | None,
    batch_df: DataFrame,
    key_cols: list[str],
    target: str,
) -> None:
    """One upsert step: replace keys touched by the batch, keep the rest,
    write the new state version to ``target`` (never in-place)."""
    if prev_path is None:
        batch_df.write.mode("overwrite").parquet(target)
        return
    state = spark.read.parquet(prev_path)
    keep = state.join(batch_df.select(*key_cols), key_cols, "left_anti")
    keep.unionByName(batch_df).write.mode("overwrite").parquet(target)


def foreach_batch_upsert(
    agg_stream: DataFrame,
    key_cols: list[str],
    state_root: str,
) -> str:
    """Run an update-mode aggregated stream to completion (availableNow),
    merging every micro-batch into a versioned keyed state table under
    ``state_root``. Returns the path of the final state version."""
    latest: dict[str, str] = {}
    spark = agg_stream.sparkSession

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(state_root, f"v{batch_id}")
        merge_state(spark, latest.get("path"), batch_df, key_cols, target)
        latest["path"] = target

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg_stream.writeStream.outputMode("update")
            .foreachBatch(upsert)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    return latest["path"]


def streaming_upsert_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event totals maintained incrementally via foreachBatch
    upsert, then read back from the final state version. Equal to the batch
    groupBy by construction — the oracle checks exactly that."""
    events = read_events_stream(spark, sf_dir)
    agg = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        # exact integer-cents state: order-free across micro-batches and
        # merge order (the raw double sum is the replica-scale drift class)
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("_total_c"),
    )
    root = tempfile.mkdtemp(prefix="amde_upsert_")
    final = foreach_batch_upsert(agg, ["user_id"], root)
    return (
        spark.read.parquet(final)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("_total_c").cast("double") / 100, 4).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Exactly-once streaming shard egress (batch-id high-water mark).
# ---------------------------------------------------------------------------


class ShardEgress:
    """Idempotent, replay-safe training-shard sink for ``foreachBatch`` —
    the production story for continuous corpus ingestion: every
    micro-batch lands via :func:`~azure_medicine_data_engineering_spark.
    sources.writers.write_training_shards` under ``<root>/b<batch_id>``,
    and a batch-id HIGH-WATER MARK (``<root>/_HWM``, written atomically
    via rename AFTER the batch's shards + manifest are durable) makes the
    whole pipeline exactly-once under Structured Streaming's replay
    contract (same checkpoint + replayable source → a restarted query
    re-delivers the same batch_id with the same rows):

    - replay of a COMMITTED batch (crash after marker): ``batch_id <=
      hwm`` → skipped entirely, bytes on disk untouched;
    - replay of an UNCOMMITTED batch (crash between data write and
      marker): the deterministic shard write (``mode=overwrite``, integer
      ``seq div k`` assignment — no sampling, no randomness) rewrites the
      same rows, then the marker commits — net effect identical to a
      single clean run.

    At 100 TB the marker is one tiny file per trigger and the per-batch
    write is one keyed repartition; swap the marker device for a
    transactional table commit (Delta/Iceberg txn id) without touching
    the dataflow."""

    def __init__(
        self,
        root: str,
        shard_col: str = "seq_id",
        seqs_per_shard: int = 16,
    ) -> None:
        self.root = root
        self.shard_col = shard_col
        self.seqs_per_shard = seqs_per_shard
        os.makedirs(root, exist_ok=True)

    def high_water_mark(self) -> int:
        try:
            with open(os.path.join(self.root, "_HWM")) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def _advance_hwm(self, batch_id: int) -> None:
        tmp = os.path.join(self.root, "_HWM.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(self.root, "_HWM"))  # atomic commit

    def batch_paths(self) -> list[str]:
        return sorted(
            os.path.join(self.root, d, "shards")
            for d in os.listdir(self.root)
            if d.startswith("b") and d[1:].isdigit()
        )

    def commit_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Returns True iff this call performed the write (False = replay
        of an already-committed batch, skipped)."""
        if batch_id <= self.high_water_mark():
            return False
        from azure_medicine_data_engineering_spark.sources.writers import (
            write_training_shards,
        )

        write_training_shards(
            batch_df,
            os.path.join(self.root, f"b{batch_id}", "shards"),
            shard_col=self.shard_col,
            seqs_per_shard=self.seqs_per_shard,
        )
        self._advance_hwm(batch_id)  # marker LAST: data is already durable
        return True

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.commit_batch(batch_df, batch_id)


def run_shard_egress(
    stream_df: DataFrame,
    root: str,
    shard_col: str = "seq_id",
    seqs_per_shard: int = 16,
) -> ShardEgress:
    """Drain a bounded stream (availableNow) through :class:`ShardEgress`
    and return the egress handle (``batch_paths()`` lists the landed
    batch shard dirs)."""
    egress = ShardEgress(root, shard_col, seqs_per_shard)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream_df.writeStream.outputMode("append")
            .foreachBatch(egress)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    return egress


# ---------------------------------------------------------------------------
# Exactly-once CURATED WDS shard egress (round 14): the multimodal funnel's
# survivors shipped back out as WebDataset tars, continuously.
# ---------------------------------------------------------------------------


class WdsCuratedEgress:
    """Replay-safe ``foreachBatch`` sink for curated image+caption samples:
    every micro-batch's samples are assembled into WDS shard tars
    (``sources/webdataset.py:write_curated_wds_shards`` — sparse
    ``media_id div samples_per_shard`` keys, tmp-write + atomic rename per
    tar) under ``<root>/b<batch_id>/``, then the batch-id high-water mark
    (``_HWM``, rename-committed MARKER-LAST) makes the whole pipeline
    exactly-once under the Structured Streaming replay contract — the same
    discipline as :class:`ShardEgress`, with tar shards instead of parquet:

    - replay of a COMMITTED batch: skipped, landed tar bytes untouched;
    - replay of an UNCOMMITTED batch (crash between tar writes and
      marker): the deterministic assembly (ascending-id members, pinned
      tar metadata, integer shard keys) rewrites byte-identical tars.

    A shard key whose samples span micro-batches lands one partial tar per
    batch dir (the established ShardEgress layout); the manifest and any
    loader aggregate by shard across batch dirs."""

    def __init__(
        self, root: str, samples_per_shard: int = 8, writer=None
    ) -> None:
        """``writer`` (round 15): the shard-assembly function
        ``(samples_df, out_dir, samples_per_shard) -> report`` — defaults
        to the image+caption ``write_curated_wds_shards``; the multimodal
        egress passes ``write_curated_mm_shards``. Both land tars via the
        same attempt-unique tmp + atomic rename, so the replay contract
        is writer-independent."""
        self.root = root
        self.samples_per_shard = samples_per_shard
        self._writer = writer
        os.makedirs(root, exist_ok=True)

    def high_water_mark(self) -> int:
        try:
            with open(os.path.join(self.root, "_HWM")) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def _advance_hwm(self, batch_id: int) -> None:
        tmp = os.path.join(self.root, "_HWM.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(self.root, "_HWM"))

    def commit_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """True iff this call wrote (False = replay of a committed batch)."""
        if batch_id <= self.high_water_mark():
            return False
        from azure_medicine_data_engineering_spark.sources.webdataset import (
            write_curated_wds_shards,
        )

        writer = self._writer or write_curated_wds_shards
        report = writer(
            batch_df,
            os.path.join(self.root, f"b{batch_id}"),
            samples_per_shard=self.samples_per_shard,
        )
        report.count()  # force the distributed tar writes
        self._advance_hwm(batch_id)  # marker LAST: tars already durable
        return True

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.commit_batch(batch_df, batch_id)


def run_wds_curated_egress(
    stream_df: DataFrame, root: str, samples_per_shard: int = 8, writer=None
) -> WdsCuratedEgress:
    """Drain a bounded curated-sample stream (availableNow) through
    :class:`WdsCuratedEgress` (``writer`` selects the shard assembly —
    image+caption default or the multimodal four-member form)."""
    egress = WdsCuratedEgress(root, samples_per_shard, writer=writer)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream_df.writeStream.outputMode("append")
            .foreachBatch(egress)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    return egress
