"""foreachBatch keyed-upsert sink (streaming/sinks.py)."""

from azure_medicine_data_engineering_spark.streaming.sinks import (
    merge_state,
    streaming_upsert_user_totals,
)


def test_merge_state_replaces_touched_keys_only(spark, tmp_path):
    b1 = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, total long"
    )
    b2 = spark.createDataFrame([(2, 25), (4, 40)], "k long, total long")
    v0, v1 = str(tmp_path / "v0"), str(tmp_path / "v1")
    merge_state(spark, None, b1, ["k"], v0)
    merge_state(spark, v0, b2, ["k"], v1)
    out = {r.k: r.total for r in spark.read.parquet(v1).collect()}
    # 2 replaced by the newer batch, 4 inserted, 1 and 3 kept
    assert out == {1: 10, 2: 25, 3: 30, 4: 40}


def test_merge_state_never_writes_in_place(spark, tmp_path):
    b1 = spark.createDataFrame([(1, 10)], "k long, total long")
    b2 = spark.createDataFrame([(1, 11)], "k long, total long")
    v0, v1 = str(tmp_path / "v0"), str(tmp_path / "v1")
    merge_state(spark, None, b1, ["k"], v0)
    merge_state(spark, v0, b2, ["k"], v1)
    # prior version still readable (time travel / crash safety)
    assert spark.read.parquet(v0).head().total == 10
    assert spark.read.parquet(v1).head().total == 11


def test_streaming_upsert_equals_batch(spark):
    sf = "/root/testdata/sf0.001"
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.queries.registry import (
        events_table,
    )

    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in streaming_upsert_user_totals(spark, sf).collect()
    }
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in events_table(spark, sf)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value").cast("double"), 4).alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_streaming_corpus_dedup_planted(spark, tmp_path):
    import shutil

    from azure_medicine_data_engineering_spark.streaming.windows import (
        streaming_corpus_dedup_counts,
    )

    # history = ids % 5 == 0 -> {0: "alpha beta", 5: "gamma"}
    # stream  = others       -> dup pair (1,2), one known (3), one new (4)
    rows = [
        (0, "alpha beta", "en", "s", 10),
        (5, "gamma", "en", "s", 5),
        (1, "Alpha  BETA", "en", "s", 11),   # normalizes to history fp (known)
        (2, "alpha beta", "en", "s", 10),    # dup of 1 within stream
        (3, "delta", "en", "s", 5),          # new
        (4, "epsilon", "en", "s", 7),        # new
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "_tmp"))
    part = next((d / "_tmp").glob("part-*.parquet"))
    shutil.move(str(part), str(d / "documents.parquet"))
    shutil.rmtree(d / "_tmp")
    out = streaming_corpus_dedup_counts(spark, str(d)).collect()[0]
    # stream fps: {alpha beta, delta, epsilon} -> 3 unique; alpha beta known
    assert (out.n_stream_unique, out.n_truly_new, out.n_known) == (3, 2, 1)


# ---------------------------------------------------------------------------
# Exactly-once shard egress: kill/replay semantics.
# ---------------------------------------------------------------------------


def _egress_snapshot(spark, egress):
    """Full durable state: every landed row + per-batch manifests + hwm."""
    rows = []
    for p in egress.batch_paths():
        rows.extend(
            tuple(r) for r in spark.read.parquet(p)
            .select("seq_id", "payload", "shard").collect()
        )
    manifests = []
    for p in egress.batch_paths():
        manifests.extend(
            tuple(r) for r in spark.read.parquet(p + "_manifest").collect()
        )
    return (sorted(rows), sorted(manifests), egress.high_water_mark())


def test_shard_egress_exactly_once_replay(spark, tmp_path):
    import os

    from azure_medicine_data_engineering_spark.streaming.sinks import (
        ShardEgress,
        run_shard_egress,
    )

    src = spark.createDataFrame(
        [(i, f"p{i}") for i in range(40)], "seq_id long, payload string"
    )
    stage = str(tmp_path / "stage")
    src.repartition(4).write.parquet(stage)
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    root = str(tmp_path / "egress")

    # record every delivered micro-batch so the test can replay it
    # verbatim, the way a restarted checkpointed query would
    delivered: dict[int, list] = {}
    egress = ShardEgress(root, shard_col="seq_id", seqs_per_shard=8)

    def recording_sink(batch_df, batch_id):
        delivered[batch_id] = batch_df.collect()
        egress(batch_df, batch_id)

    import tempfile

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(recording_sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    assert len(delivered) == 4  # one file per trigger
    last_bid = max(delivered)
    assert egress.high_water_mark() == last_bid
    baseline = _egress_snapshot(spark, egress)
    # all 40 rows landed exactly once
    assert len(baseline[0]) == 40
    assert sorted({r[0] for r in baseline[0]}) == list(range(40))

    # (1) replay of a COMMITTED batch (crash after the marker): skipped,
    # durable state byte-identical
    replay_df = spark.createDataFrame(delivered[0], src.schema)
    assert egress.commit_batch(replay_df, 0) is False
    assert _egress_snapshot(spark, egress) == baseline

    # (2) kill between data write and marker: rewind the hwm to simulate
    # the marker never landing, then replay the same batch — the write
    # re-runs (True) and the final state is identical to the clean run
    egress._advance_hwm(last_bid - 1)
    replay_last = spark.createDataFrame(delivered[last_bid], src.schema)
    assert egress.commit_batch(replay_last, last_bid) is True
    assert _egress_snapshot(spark, egress) == baseline


def test_shard_egress_resume_skips_committed_prefix(spark, tmp_path):
    """A restarted query re-delivering batches 0..n must rewrite NOTHING
    for the committed prefix: every commit_batch returns False and mtimes
    of the landed batch dirs are untouched."""
    import os

    from azure_medicine_data_engineering_spark.streaming.sinks import ShardEgress

    src = spark.createDataFrame(
        [(i, f"p{i}") for i in range(12)], "seq_id long, payload string"
    )
    root = str(tmp_path / "egress2")
    egress = ShardEgress(root, shard_col="seq_id", seqs_per_shard=4)
    batches = [src.where(f"seq_id div 4 = {b}") for b in range(3)]
    for b, bdf in enumerate(batches):
        assert egress.commit_batch(bdf, b) is True
    mtimes = {p: os.path.getmtime(p) for p in egress.batch_paths()}
    for b, bdf in enumerate(batches):  # full replay from scratch
        assert egress.commit_batch(bdf, b) is False
    assert {p: os.path.getmtime(p) for p in egress.batch_paths()} == mtimes


# ---------------------------------------------------------------------------
# Round 13: streaming image dedup — kill/replay idempotence.
# ---------------------------------------------------------------------------


def test_streaming_image_dedup_kill_replay(spark, tmp_path):
    """A micro-batch replayed after a simulated crash (written, but the
    checkpoint never committed) overwrites its own versioned slot with
    identical rows — the drained union equals the batch twin's report
    with no duplicates."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.image_hash import (
        attach_family_png_payload,
        corpus_match_report,
        image_perceptual_hashes,
    )
    from azure_medicine_data_engineering_spark.queries.image_dedup import PH_H, PH_W
    from azure_medicine_data_engineering_spark.streaming.windows import (
        image_dedup_process_batch,
    )

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    corp = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)
    h_corp = image_perceptual_hashes(
        attach_family_png_payload(corp, "doc_id", PH_W, PH_H)
    ).localCheckpoint(eager=True)

    state_root = str(tmp_path / "state")
    batch0 = new.where(F.col("doc_id") < 20)
    batch1 = new.where(F.col("doc_id") >= 20)
    image_dedup_process_batch(batch0, h_corp, state_root, 0)
    # simulated crash AFTER the write, BEFORE the checkpoint commit:
    # the engine re-delivers batch 0, then proceeds with batch 1
    image_dedup_process_batch(batch0, h_corp, state_root, 0)
    image_dedup_process_batch(batch1, h_corp, state_root, 1)

    import os

    drained = spark.read.parquet(
        *[os.path.join(state_root, d) for d in sorted(os.listdir(state_root))]
    )
    expect = corpus_match_report(new, h_corp, PH_W, PH_H)
    got = sorted(tuple(r) for r in drained.collect())
    want = sorted(tuple(r) for r in expect.collect())
    assert got == want
    assert len(got) == new.count()  # no replay duplicates


# ---------------------------------------------------------------------------
# Round 14: curated WDS shard egress — kill/replay byte-identity.
# ---------------------------------------------------------------------------


def _curated_samples_df(spark, n=24):
    import hashlib

    from azure_medicine_data_engineering_spark.operators.multimodal import (
        png_encode_gray,
    )

    rows = []
    for i in range(n):
        text = f"sample text number {i} with the usual words and that"
        h = hashlib.md5(text.encode()).digest()
        w, ht = 4 + h[0] % 5, 4 + h[1] % 5
        px = (h * (w * ht // 16 + 1))[: w * ht]
        rows.append((i, png_encode_gray(w, ht, px), text.encode()))
    return spark.createDataFrame(rows, "media_id long, png binary, txt binary")


def _tar_md5s(root):
    import hashlib
    import os

    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".tar"):
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
    return out


def test_wds_curated_egress_exactly_once_replay(spark, tmp_path):
    import tempfile

    from azure_medicine_data_engineering_spark.streaming.sinks import (
        WdsCuratedEgress,
    )

    src = _curated_samples_df(spark)
    stage = str(tmp_path / "stage")
    src.repartition(4).write.parquet(stage)
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    root = str(tmp_path / "curated")
    delivered: dict[int, list] = {}
    egress = WdsCuratedEgress(root, samples_per_shard=8)

    def recording_sink(batch_df, batch_id):
        delivered[batch_id] = batch_df.collect()
        egress(batch_df, batch_id)

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(recording_sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    baseline = (_tar_md5s(root), egress.high_water_mark())
    assert len(delivered) >= 2  # genuinely multi-batch
    last_bid = max(delivered)

    # every sample landed exactly once across all batch-dir tars
    from azure_medicine_data_engineering_spark.sources.webdataset import (
        curated_manifest_members,
    )

    landed_ids = sorted(
        r.media_id for r in curated_manifest_members(spark, root).collect()
    )
    assert landed_ids == list(range(24))

    # (1) replay of a COMMITTED batch: skipped, tar bytes untouched
    replay0 = spark.createDataFrame(delivered[0], src.schema)
    assert egress.commit_batch(replay0, 0) is False
    assert (_tar_md5s(root), egress.high_water_mark()) == baseline

    # (2) crash between tar writes and marker: rewind hwm and replay —
    # the deterministic assembly rewrites byte-identical tars
    egress._advance_hwm(last_bid - 1)
    replay_last = spark.createDataFrame(delivered[last_bid], src.schema)
    assert egress.commit_batch(replay_last, last_bid) is True
    assert (_tar_md5s(root), egress.high_water_mark()) == baseline


def test_wds_curated_shard_split_across_batches(spark, tmp_path):
    """A shard whose samples span micro-batches lands one partial tar per
    batch dir; the manifest aggregation across dirs reassembles the full
    shard (the ShardEgress layout contract)."""
    from azure_medicine_data_engineering_spark.sources.webdataset import (
        curated_wds_manifest,
    )
    from azure_medicine_data_engineering_spark.streaming.sinks import (
        WdsCuratedEgress,
    )

    src = _curated_samples_df(spark, n=8)  # all ids in shard 0
    root = str(tmp_path / "split")
    egress = WdsCuratedEgress(root, samples_per_shard=8)
    assert egress.commit_batch(src.where("media_id < 5"), 0) is True
    assert egress.commit_batch(src.where("media_id >= 5"), 1) is True
    [m] = curated_wds_manifest(spark, root).collect()
    assert (m.shard_id, m.n_samples, m.sum_ids) == (0, 8, sum(range(8)))


# ---------------------------------------------------------------------------
# Round 14: streaming alignment gate — kill/replay idempotence + split
# equality.
# ---------------------------------------------------------------------------


def test_streaming_alignment_gate_kill_replay(spark, tmp_path):
    from azure_medicine_data_engineering_spark.streaming.windows import (
        alignment_gate_process_batch,
    )

    docs = spark.createDataFrame(
        [
            (
                i,
                f"s{i % 2}",
                f"document {i} body with the usual words and that content",
            )
            for i in range(12)
        ],
        "doc_id long, source string, text string",
    )
    root = str(tmp_path / "align_state")

    def snap():
        import os

        out = {}
        for d in sorted(os.listdir(root)):
            rows = sorted(
                tuple(r)
                for r in spark.read.parquet(f"{root}/{d}").collect()
            )
            out[d] = rows
        return out

    b0, b1 = docs.where("doc_id < 7"), docs.where("doc_id >= 7")
    alignment_gate_process_batch(b0, root, 0)
    alignment_gate_process_batch(b1, root, 1)
    baseline = snap()

    # replay (crash between write and checkpoint commit): the batch
    # overwrites its own slot with identical rows
    alignment_gate_process_batch(b1, root, 1)
    assert snap() == baseline

    # ANY split sums to the whole-input aggregate (map-only gate)
    import os
    import shutil

    root2 = str(tmp_path / "align_whole")
    alignment_gate_process_batch(docs, root2, 0)
    whole = {
        (r.source): (r.n_samples, r.n_planted, r.n_kept)
        for r in spark.read.parquet(f"{root2}/v0").collect()
    }
    summed: dict = {}
    for d in os.listdir(root):
        for r in spark.read.parquet(f"{root}/{d}").collect():
            s = summed.setdefault(r.source, [0, 0, 0])
            s[0] += r.n_samples
            s[1] += r.n_planted
            s[2] += r.n_kept
    assert {g: tuple(v) for g, v in summed.items()} == whole
    shutil.rmtree(root2, ignore_errors=True)


def test_budgeted_funnel_allocations_exhaust_budget(spark):
    """Waterfill invariant at the funnel stage: kept-URL count equals
    min(budget, total allowed) exactly — the max-min fair allocation
    leaves nothing unassigned (property the oracle also enforces via the
    closed form)."""
    from azure_medicine_data_engineering_spark.operators.sampling import (
        token_budget_waterfill,
    )

    rows = [(f"h{i % 5}", f"/u{i}") for i in range(37)]
    df = spark.createDataFrame(rows, "host string, path string")
    for budget in (5, 22, 36, 37, 500):
        wf = token_budget_waterfill(
            df, budget=budget, group_col="host", text_col="path"
        )
        total = sum(r.alloc_tokens for r in wf.collect())
        assert total == min(budget, 37), (budget, total)


def test_streaming_frontier_budget_kill_replay(spark, tmp_path):
    """Round 15: the frontier-budget trigger is idempotent under replay —
    (1) re-running a committed batch overwrites its slots with identical
    rows; (2) a kill between the counts write and the alloc write is
    healed by replay (the alloc is recomputed from the landed count
    partials alone)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.streaming.windows import (
        frontier_budget_process_batch,
    )

    docs = spark.createDataFrame(
        [(i, f"frontier doc {i} body with words " * 3) for i in range(24)],
        ["doc_id", "text"],
    )
    state = str(tmp_path / "state")
    os.makedirs(state)
    batches = [docs.where(F.col("doc_id") % 3 == k) for k in range(3)]
    for bid, bdf in enumerate(batches):
        frontier_budget_process_batch(bdf, state, bid)

    def snap(bid):
        alloc = sorted(
            map(
                tuple,
                spark.read.parquet(f"{state}/v{bid}/alloc").collect(),
            )
        )
        counts = sorted(
            map(
                tuple,
                spark.read.parquet(f"{state}/v{bid}/counts").collect(),
            )
        )
        return counts, alloc

    baseline = [snap(b) for b in range(3)]

    # (1) full replay of the middle batch: identical slots
    frontier_budget_process_batch(batches[1], state, 1)
    assert snap(1) == baseline[1]
    assert snap(2) == baseline[2]  # later slots untouched

    # (2) kill between counts and alloc on the LAST batch: drop the
    # alloc, replay, and the recomputed allocation is identical (it only
    # depends on landed count partials v0..v2)
    shutil.rmtree(f"{state}/v2/alloc")
    frontier_budget_process_batch(batches[2], state, 2)
    assert snap(2) == baseline[2]

    # the final allocation equals the one-shot batch solve on all docs
    frontier_budget_process_batch(docs, str(tmp_path / "oneshot"), 0)
    oneshot = sorted(
        map(
            tuple,
            spark.read.parquet(
                str(tmp_path / "oneshot/v0/alloc")
            ).collect(),
        )
    )
    assert sorted(map(tuple, spark.read.parquet(f"{state}/v2/alloc").collect())) == oneshot


def test_mm_egress_writer_replay_byte_identity(spark, tmp_path):
    """Round 15: the WdsCuratedEgress replay contract holds with the
    MULTIMODAL writer plugged in — a replayed committed batch is skipped
    and an uncommitted replay rewrites byte-identical four-member tars."""
    from azure_medicine_data_engineering_spark.sources.webdataset import (
        attach_wds_multimodal_payload,
        extract_curated_mm_samples,
        write_curated_mm_shards,
    )
    from azure_medicine_data_engineering_spark.streaming.sinks import (
        WdsCuratedEgress,
    )

    docs = spark.createDataFrame(
        [(i, f"mm egress doc {i} body") for i in range(16)],
        ["doc_id", "text"],
    )
    media = attach_wds_multimodal_payload(docs, "doc_id", "text")
    ids = spark.createDataFrame([(i,) for i in range(16)], ["media_id"])
    samples = extract_curated_mm_samples(media, ids).persist()
    b0 = samples.where("media_id < 8")
    b1 = samples.where("media_id >= 8")

    root = str(tmp_path / "mm")
    egress = WdsCuratedEgress(root, 8, writer=write_curated_mm_shards)
    assert egress.commit_batch(b0, 0) is True
    assert egress.commit_batch(b1, 1) is True
    baseline = (_tar_md5s(root), egress.high_water_mark())

    assert egress.commit_batch(b0, 0) is False  # committed: skipped
    assert (_tar_md5s(root), egress.high_water_mark()) == baseline

    egress._advance_hwm(0)  # crash between tars and marker
    assert egress.commit_batch(b1, 1) is True
    assert (_tar_md5s(root), egress.high_water_mark()) == baseline
    samples.unpersist()


# ---------------------------------------------------------------------------
# Round 15: streaming shot-level dedup — kill/replay idempotence.
# ---------------------------------------------------------------------------


def test_streaming_shot_dedup_kill_replay(spark, tmp_path):
    """A replayed shot-dedup micro-batch overwrites its own versioned
    slot with identical rows; the drained union equals the batch twin's
    keyframe report (two keyframes per clip) with no duplicates."""
    import os

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.video_hash import (
        scene_shot_keyframes,
        shot_corpus_match_report,
    )
    from azure_medicine_data_engineering_spark.streaming.windows import (
        shot_dedup_process_batch,
    )

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    corp = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)
    kf_c, media_c = scene_shot_keyframes(corp)
    kf_corp = kf_c.localCheckpoint(eager=True)
    media_c.unpersist()

    state_root = str(tmp_path / "state")
    batch0 = new.where(F.col("doc_id") < 20)
    batch1 = new.where(F.col("doc_id") >= 20)
    shot_dedup_process_batch(batch0, kf_corp, state_root, 0)
    # simulated crash AFTER the write, BEFORE the checkpoint commit
    shot_dedup_process_batch(batch0, kf_corp, state_root, 0)
    shot_dedup_process_batch(batch1, kf_corp, state_root, 1)

    drained = spark.read.parquet(
        *[os.path.join(state_root, d) for d in sorted(os.listdir(state_root))]
    )
    kf_new, media_n = scene_shot_keyframes(new)
    expect = shot_corpus_match_report(kf_new, kf_corp)
    got = sorted(tuple(r) for r in drained.collect())
    want = sorted(tuple(r) for r in expect.collect())
    media_n.unpersist()
    assert got == want
    assert len(got) == 2 * new.count()  # two keyframes per clip, no dups
    # planted structure: every new clip's scene-1 keyframe has exact
    # corpus duplicates (bump-free pan 0 shared within the id//4 family)
    shot0 = [r for r in got if r[2] == 0]
    assert shot0 and all(r[3] >= 1 and r[4] == 0 for r in shot0)


# ---------------------------------------------------------------------------
# Round 15: streaming silence segmentation — kill/replay idempotence.
# ---------------------------------------------------------------------------


def test_streaming_silence_kill_replay(spark, tmp_path):
    """A replayed silence-segmentation micro-batch overwrites its own
    versioned slot; the drained union equals the batch twin's per-segment
    report with no duplicates."""
    import os

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.media_av import (
        attach_speech_wav_payload,
        silence_segments_report,
        speech_gap_layout,
    )
    from azure_medicine_data_engineering_spark.streaming.windows import (
        silence_process_batch,
    )

    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    state_root = str(tmp_path / "state")
    batch0 = docs.where(F.col("doc_id") < 12)
    batch1 = docs.where(F.col("doc_id") >= 12)
    silence_process_batch(batch0, state_root, 0)
    # simulated crash AFTER the write, BEFORE the checkpoint commit
    silence_process_batch(batch0, state_root, 0)
    silence_process_batch(batch1, state_root, 1)

    drained = spark.read.parquet(
        *[os.path.join(state_root, d) for d in sorted(os.listdir(state_root))]
    )
    expect = silence_segments_report(
        attach_speech_wav_payload(docs, "doc_id")
    )
    got = sorted(tuple(r) for r in drained.collect())
    want = sorted(tuple(r) for r in expect.collect())
    assert got == want
    exp_n = sum(len(speech_gap_layout(i)) + 1 for i in range(24))
    assert len(got) == exp_n  # one row per planted segment, no dups
