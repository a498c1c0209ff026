"""WebDataset-style tar shard ingest — the de-facto container for
multimodal TRAINING shards (a POSIX tar whose members group into samples
by basename: ``000123.jpg`` + ``000123.txt`` + ``000123.json`` is one
sample). The natural companion to the WARC ingest (`sources/warc.py`):
WARC is how raw crawl data arrives, tar shards are how curated training
samples ship.

Reader/writer are stdlib ``tarfile`` over in-memory payloads (the 512-byte
ustar block format; mtime/uid pinned so fixture bytes are deterministic);
the Spark stage explodes one shard payload into per-member rows and
derives the WebDataset sample key (basename before the first dot) and
extension — map-only Arrow batches, no shuffle. Production points the same
stage at ``binaryFile``-read ``.tar`` shards.

No counterpart in the reference (training-data scale extension, same
class as WARC/AVI)."""

from __future__ import annotations

import hashlib
import io
import tarfile
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def tar_write_members(members: list[tuple[str, bytes]]) -> bytes:
    """Serialize ``[(name, content), ...]`` into a POSIX tar (ustar),
    deterministic bytes: mtime 0, uid/gid 0, mode 0644."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, content in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(content)
            info.mtime = 0
            info.uid = info.gid = 0
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(content))
    return buf.getvalue()


def tar_read_members(payload: bytes) -> list[tuple[str, bytes]]:
    """Parse a tar payload into ``[(name, content), ...]`` (regular files
    only, archive order preserved). Raises ValueError on non-tar input."""
    try:
        with tarfile.open(fileobj=io.BytesIO(payload), mode="r:") as tf:
            out = []
            for info in tf:
                if not info.isreg():
                    continue
                fh = tf.extractfile(info)
                out.append((info.name, fh.read() if fh else b""))
            return out
    except tarfile.TarError as exc:
        raise ValueError(f"not a tar payload: {exc}") from exc


def wds_sample_key(name: str) -> tuple[str, str]:
    """WebDataset naming: ``dir/000123.seg.txt`` → key ``dir/000123``,
    extension ``seg.txt`` (everything after the FIRST dot of the
    basename — the WebDataset convention, so ``.seg.txt`` stays one
    extension)."""
    slash = name.rfind("/")
    base = name[slash + 1 :]
    dot = base.find(".")
    if dot < 0:
        return name, ""
    return name[: slash + 1] + base[:dot], base[dot + 1 :]


def attach_wds_shard_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Deterministic WebDataset shard fixture: each document becomes a
    one-sample tar with two members — ``<key>.txt`` carrying the document
    text (UTF-8) and ``<key>.cls`` carrying a one-byte class label derived
    from md5(text) — where key = the zero-padded doc id. Deterministic
    tar bytes (pinned mtime/uid). Arrow-batched mapInPandas, no
    shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                text = str(t)
                h = hashlib.md5(text.encode("utf-8")).digest()
                key = f"{int(i):09d}"
                members = [
                    (f"{key}.txt", text.encode("utf-8")),
                    (f"{key}.cls", str(h[0] % 10).encode()),
                ]
                ids.append(i)
                payloads.append(tar_write_members(members))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "wds", "payload": payloads}
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    made = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(run, out_schema)
    return made.withColumn("byte_len", F.length("payload").cast("int"))


WDS_MEMBER_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("member_idx", IntegerType()),
        StructField("sample_key", StringType()),
        StructField("ext", StringType()),
        StructField("size", LongType()),
        StructField("content_md5", StringType()),
    ]
)


def wds_ingest_members(df: DataFrame) -> DataFrame:
    """Explode WebDataset tar shards into per-member rows ``(media_id,
    member_idx, sample_key, ext, size, content_md5)`` — the shard-reader
    fan-out a multimodal training loader runs (group by sample_key
    downstream to reassemble samples). One Arrow pass, map-only."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for k, (name, content) in enumerate(tar_read_members(bytes(p))):
                    key, ext = wds_sample_key(name)
                    rows.append(
                        (
                            mid,
                            k,
                            key,
                            ext,
                            len(content),
                            hashlib.md5(content).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "member_idx", "sample_key", "ext", "size",
                    "content_md5",
                ],
            )

    return df.mapInPandas(run, WDS_MEMBER_SCHEMA)


# ---------------------------------------------------------------------------
# Round 13: LAION-style image+caption samples + the CLIP-score-shaped
# alignment gate (cross-modal curation — the filter every multimodal
# pretraining pipeline runs before training).
# ---------------------------------------------------------------------------

#: two-tower embedding dimension for the deterministic alignment stub —
#: 32 keeps the random-pair cosine std ~0.18, so the 0.6 threshold
#: separates aligned (~0.995) from mismatched pairs with wide margin.
ALIGN_DIM = 32

#: shared-expression strings for the alignment gate (canonical home —
#: importable without the query-registry side effects): exact integer
#: cosine state finalized by ONE double expression, keep-rate snapped
#: half-up on the 1e-4 grid, threshold as a scientific literal
ALIGN_COS_EXPR = "CAST(dot AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE))"
ALIGN_KEEP_EXPR = (
    "floor(CAST(n_kept AS DOUBLE) / CAST(n_samples AS DOUBLE) * 1e4 + 5e-1) / 1e4"
)
ALIGN_THRESHOLD = "6e-1"


def _grid_embedding(fp_hex: str, modality_prefix: str) -> list[int]:
    """Deterministic integer-grid "CLIP tower": base vector from the
    content fingerprint (shared across modalities — two towers projecting
    the same content land near each other) plus a small modality-specific
    delta. Every slot is an exact integer, so the md5-chain is
    reproducible in any engine; the only float op is the final cosine."""
    out = []
    for j in range(ALIGN_DIM):
        b = int(hashlib.md5(f"{fp_hex}:{j}".encode()).hexdigest()[:8], 16) % 2001 - 1000
        d = (
            int(
                hashlib.md5(f"{modality_prefix}:{fp_hex}:{j}".encode()).hexdigest()[:8],
                16,
            )
            % 101
            - 50
        )
        out.append(b + d)
    return out


def attach_wds_image_caption_payload(
    df: DataFrame, id_col: str, text_col: str, misalign_denom: int = 4
) -> DataFrame:
    """Deterministic LAION-shaped WDS fixture: each document becomes a
    one-sample tar with a REAL grayscale PNG (pixels = md5(text) digest
    tiled, same rule as `multimodal.attach_png_payload` — any standard
    viewer decodes it) and a ``<key>.txt`` caption. A deterministic
    1/``misalign_denom`` slice of samples (md5(text) byte 2) gets a
    MISMATCHED caption (``'mismatch ' + text``) — the planted
    image-text misalignment the gate must catch. Arrow map-only."""
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        png_encode_gray,
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                text = str(t)
                h = hashlib.md5(text.encode("utf-8")).digest()
                w = 4 + h[0] % 13
                ht = 4 + h[1] % 11
                n = w * ht
                pixels = (h * (n // 16 + 1))[:n]
                caption = ("mismatch " + text) if h[2] % misalign_denom == 0 else text
                key = f"{int(i):09d}"
                members = [
                    (f"{key}.png", png_encode_gray(w, ht, pixels)),
                    (f"{key}.txt", caption.encode("utf-8")),
                ]
                ids.append(i)
                payloads.append(tar_write_members(members))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "wds", "payload": payloads}
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    made = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(run, out_schema)
    return made.withColumn("byte_len", F.length("payload").cast("int"))


ALIGN_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dot", LongType()),
        StructField("na", LongType()),
        StructField("nb", LongType()),
        # recovered image content fingerprint + extracted caption (round-13
        # funnel: downstream stages gate on the WIRE-extracted values, not
        # a recomputation from the source table)
        StructField("fp_img", StringType()),
        StructField("caption", StringType()),
    ]
)


def image_text_alignment_stats(df: DataFrame) -> DataFrame:
    """CLIP-score-shaped alignment statistics per WDS sample: REALLY
    parse the tar, REALLY decode the PNG member (stdlib chunk-CRC walk +
    inflate + defilter), recover the image's content fingerprint FROM THE
    DECODED PIXELS (the fixture's pixels are the tiled md5 digest, so the
    first 16 samples are the digest — a stub image tower that fails loudly
    if the decode is wrong), embed both towers on the shared integer
    grid, and emit the EXACT integer cosine state ``(dot, na, nb)``. The
    cosine itself is finalized by ONE shared double expression Spark-side
    (CLAUDE.md shared-expression rule) so the oracle can replay it
    bit-identically. Arrow map-only, no shuffle."""
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        png_decode_pixels,
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                png = txt = None
                for name, content in tar_read_members(bytes(p)):
                    _, ext = wds_sample_key(name)
                    if ext == "png":
                        png = content
                    elif ext == "txt":
                        txt = content
                if png is None or txt is None:
                    raise ValueError(f"sample {mid}: missing png/txt member")
                _, _, _, pixels = png_decode_pixels(png)
                fp_img = bytes(pixels[:16]).hex()
                fp_txt = hashlib.md5(txt).hexdigest()
                ei = _grid_embedding(fp_img, "i")
                et = _grid_embedding(fp_txt, "t")
                dot = sum(a * b for a, b in zip(ei, et))
                na = sum(a * a for a in ei)
                nb = sum(b * b for b in et)
                rows.append(
                    (int(mid), dot, na, nb, fp_img, txt.decode("utf-8"))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "dot", "na", "nb", "fp_img", "caption"],
            )

    return df.select("media_id", "payload").mapInPandas(run, ALIGN_STATS_SCHEMA)


def attach_wds_multisample_payload(
    df: DataFrame, id_col: str, text_col: str, samples_per_shard: int = 8
) -> DataFrame:
    """Deterministic MULTI-sample WebDataset shards — the realistic shard
    granularity (production shards hold thousands of samples; the
    one-sample fixture above isolates per-sample logic): documents group
    into shard ``id div samples_per_shard``, each shard is ONE tar whose
    members are the group's ``<key>.txt`` + ``<key>.cls`` pairs in
    ascending id order (deterministic bytes). The assembly is a keyed
    shuffle (groupBy shard) + one Arrow pass per shard group — the actual
    shard-writer shape (one shard = one work unit downstream)."""
    from pyspark.sql.types import (
        BinaryType as _B,
        IntegerType as _I,
        LongType as _L,
        StringType as _S,
        StructField as _F,
        StructType as _T,
    )

    out_schema = _T(
        [
            _F("shard_id", _L()),
            _F("n_docs", _I()),
            _F("payload", _B()),
        ]
    )

    def build(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        members = []
        for i, t in zip(pdf[id_col], pdf[text_col]):
            text = str(t)
            h = hashlib.md5(text.encode("utf-8")).digest()
            k = f"{int(i):09d}"
            members.append((f"{k}.txt", text.encode("utf-8")))
            members.append((f"{k}.cls", str(h[0] % 10).encode()))
        return pd.DataFrame(
            {
                "shard_id": [int(key[0])],
                "n_docs": [len(pdf)],
                "payload": [tar_write_members(members)],
            }
        )

    staged = df.select(
        # integer div, never double-/ (CLAUDE.md: double division
        # truncates toward zero and misrounds above 2^53)
        F.expr(
            f"cast({id_col} as long) div {int(samples_per_shard)}"
        ).alias("_shard"),
        F.col(id_col).cast("long").alias(id_col),
        F.col(text_col),
    )
    return staged.groupBy("_shard").applyInPandas(build, out_schema)


def wds_sample_assembly_report(members_df: DataFrame) -> DataFrame:
    """Reassemble exploded member rows into SAMPLES (the loader's
    grouping): per shard, count members, distinct sample keys, COMPLETE
    samples (both .txt and .cls present), and total member bytes. Keyed
    aggregations only."""
    per_sample = members_df.groupBy("media_id", "sample_key").agg(
        F.count(F.lit(1)).cast("int").alias("n_members_s"),
        F.max((F.col("ext") == "txt").cast("int")).alias("has_txt"),
        F.max((F.col("ext") == "cls").cast("int")).alias("has_cls"),
        F.sum("size").cast("long").alias("bytes_s"),
    )
    return (
        per_sample.groupBy(F.col("media_id").alias("shard_id"))
        .agg(
            F.sum("n_members_s").cast("long").alias("n_members"),
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            F.sum(
                ((F.col("has_txt") == 1) & (F.col("has_cls") == 1)).cast("long")
            )
            .cast("long")
            .alias("n_complete"),
            F.sum("bytes_s").cast("long").alias("sum_sizes"),
        )
    )


# ---------------------------------------------------------------------------
# Round 14: curated-shard EGRESS — the funnel's survivors written back out
# as WebDataset shards (the production handoff: curation ends by shipping
# N-sample tars + a manifest, not a parquet of ids). Shard assignment is
# the SPARSE content key ``media_id div samples_per_shard`` — stable under
# arbitrary micro-batching and replay (no global coordination, no dense
# rank), the property the exactly-once streaming twin depends on; dense
# compaction is a separate batch step if a loader needs gap-free shards.
# ---------------------------------------------------------------------------

CURATED_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("png", BinaryType()),
        StructField("txt", BinaryType()),
    ]
)


def extract_curated_samples(
    media_df: DataFrame, survivor_ids: DataFrame
) -> DataFrame:
    """Pull the PNG + caption member BYTES out of the one-sample WDS tars
    for the surviving ids (keyed semi-join, then one Arrow parse pass) —
    the curated egress repackages the bytes that crossed the wire, never a
    recomputation from the source table."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                png = txt = None
                for name, content in tar_read_members(bytes(p)):
                    _, ext = wds_sample_key(name)
                    if ext == "png":
                        png = content
                    elif ext == "txt":
                        txt = content
                if png is None or txt is None:
                    raise ValueError(f"sample {mid}: missing png/txt member")
                rows.append((int(mid), png, txt))
            yield pd.DataFrame(rows, columns=["media_id", "png", "txt"])

    kept = media_df.join(survivor_ids.select("media_id"), "media_id", "semi")
    return kept.select("media_id", "payload").mapInPandas(
        run, CURATED_SAMPLE_SCHEMA
    )


CURATED_WRITE_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("byte_len", LongType()),
    ]
)


def _land_shard_tar(out_dir: str, sid: int, payload: bytes) -> str:
    """Atomically land one shard tar as ``shard-<id 09d>.tar``. The tmp
    name is ATTEMPT-unique: under task retry / speculative execution two
    attempts of the same shard must never interleave writes to a shared
    tmp inode (a torn tar could then be published by the rename)."""
    import os as _os

    path = _os.path.join(out_dir, f"shard-{sid:09d}.tar")
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx is not None:
        attempt = str(ctx.taskAttemptId())
    else:  # driver-side unit-test path
        import uuid

        attempt = uuid.uuid4().hex
    tmp = f"{path}.{attempt}.tmp"
    with open(tmp, "wb") as fh:
        fh.write(payload)
    _os.replace(tmp, path)
    return path


def write_curated_wds_shards(
    samples_df: DataFrame, out_dir: str, samples_per_shard: int = 8
) -> DataFrame:
    """Assemble curated samples into WDS shard tars and WRITE them under
    ``out_dir`` as ``shard-<id 09d>.tar`` (tmp-write + atomic rename per
    shard, so a killed task never leaves a torn tar). One keyed shuffle
    (groupBy sparse shard key) + one Arrow pass per shard; each task
    writes its own shard — the distributed shard-writer shape (production
    points ``out_dir`` at shared storage). Returns the per-shard write
    report; the frame is lazy — count() it to force the writes."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def build(key, pdf):
        import os as _os

        import pandas as pd

        pdf = pdf.sort_values("media_id")
        _os.makedirs(out_dir, exist_ok=True)  # executor-side (shared FS)
        members = []
        for i, p, t in zip(pdf["media_id"], pdf["png"], pdf["txt"]):
            k = f"{int(i):09d}"
            members.append((f"{k}.png", bytes(p)))
            members.append((f"{k}.txt", bytes(t)))
        payload = tar_write_members(members)
        sid = int(key[0])
        _land_shard_tar(out_dir, sid, payload)
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "n_samples": [len(pdf)],
                "byte_len": [len(payload)],
            }
        )

    staged = samples_df.select(
        F.expr(f"cast(media_id as long) div {int(samples_per_shard)}").alias(
            "_shard"
        ),
        "media_id",
        "png",
        "txt",
    )
    return staged.groupBy("_shard").applyInPandas(build, CURATED_WRITE_SCHEMA)


CURATED_MANIFEST_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("media_id", LongType()),
        StructField("caption_bytes", LongType()),
        StructField("caption_ck", LongType()),
        StructField("fp_ck", LongType()),
    ]
)


def curated_manifest_members(spark, root: str) -> DataFrame:
    """Per-sample manifest rows recomputed FROM THE LANDED SHARD BYTES:
    read every ``*.tar`` under ``root`` (recursive — the streaming egress
    lands per-batch dirs), parse the tar, md5 the caption member, DECODE
    the PNG member and recover the content fingerprint from the pixels
    (fails loudly if the landed image bytes are corrupt). Checksums are
    48-bit md5 prefixes as BIGINT so the oracle can replay them in SQL.
    Aggregate by shard_id for the manifest."""

    def run(batches: Iterator) -> Iterator:
        import os as _os

        import pandas as pd

        from azure_medicine_data_engineering_spark.operators.multimodal import (
            png_decode_pixels,
        )

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                base = _os.path.basename(str(path))
                sid = int(base[len("shard-") : -len(".tar")])
                samples: dict[str, dict[str, bytes]] = {}
                for name, member in tar_read_members(bytes(content)):
                    key, ext = wds_sample_key(name)
                    samples.setdefault(key, {})[ext] = member
                for key, d in samples.items():
                    if "png" not in d or "txt" not in d:
                        raise ValueError(
                            f"{base}: sample {key} missing png/txt member"
                        )
                    _, _, _, pixels = png_decode_pixels(d["png"])
                    fp = bytes(pixels[:16]).hex()
                    cap_md5 = hashlib.md5(d["txt"]).hexdigest()
                    rows.append(
                        (
                            sid,
                            int(key),
                            len(d["txt"]),
                            int(cap_md5[:12], 16),
                            int(fp[:12], 16),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard_id", "media_id", "caption_bytes", "caption_ck",
                    "fp_ck",
                ],
            )

    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    return bf.select("path", "content").mapInPandas(
        run, CURATED_MANIFEST_SCHEMA
    )


def curated_wds_manifest(spark, root: str) -> DataFrame:
    """The curated-shard MANIFEST from landed bytes: per shard, sample
    count, id checksum, caption byte/md5 checksums, and the
    decoded-pixel fingerprint checksum."""
    return (
        curated_manifest_members(spark, root)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            F.sum("media_id").cast("long").alias("sum_ids"),
            F.sum("caption_bytes").cast("long").alias("caption_bytes"),
            F.sum("caption_ck").cast("long").alias("caption_ck"),
            F.sum("fp_ck").cast("long").alias("fp_ck"),
        )
    )


IMAGE_EMB_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


#: SemDeDup fixture cluster structure (round 15 — the round-14 verdict's
#: fixture-realism fix): samples sharing ``media_id div SEM_FAMILY_DIV``
#: share a semantic FAMILY whose md5-derived base vector dominates the
#: embedding at SEM_BASE_SCALE x the per-sample noise (same-family cosine
#: ~0.94, cross-family ~0 +- 0.1 — both far from the 0.55 threshold), so
#: keep/drop rates are assertable. Constant family size keeps planted
#: near-dup volume linear under replicas (the pHash fixture rule).
SEM_FAMILY_DIV = 16
SEM_BASE_SCALE = 4


def _sem_family_base(fam: int) -> list[int]:
    """Per-family semantic base vector (md5 chain, exact integers)."""
    return [
        int(hashlib.md5(f"sem:{fam}:{j}".encode()).hexdigest()[:8], 16)
        % 2001
        - 1000
        for j in range(ALIGN_DIM)
    ]


def image_grid_embeddings(media_df: DataFrame) -> DataFrame:
    """Per-sample IMAGE-TOWER embeddings recovered from the WDS samples'
    DECODED PIXELS (round 14 — the SemDeDup input; round 15 adds PLANTED
    CLUSTER STRUCTURE): tar parse + PNG decode + content fingerprint from
    the pixel bytes, then embedding = ``SEM_BASE_SCALE x`` the sample's
    FAMILY base vector (``media_id div SEM_FAMILY_DIV``) plus the
    fp-derived integer-grid noise (:func:`_grid_embedding`, prefix ``i``
    — the decode chain still gates exactness). Every slot an exact small
    integer, so any engine replays it from md5 chains. One Arrow pass,
    map-only — the image sibling of the text embedding table."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from azure_medicine_data_engineering_spark.operators.multimodal import (
            png_decode_pixels,
        )

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                png = None
                for name, content in tar_read_members(bytes(p)):
                    _, ext = wds_sample_key(name)
                    if ext == "png":
                        png = content
                if png is None:
                    raise ValueError(f"sample {mid}: missing png member")
                _, _, _, pixels = png_decode_pixels(png)
                fp = bytes(pixels[:16]).hex()
                base = _sem_family_base(int(mid) // SEM_FAMILY_DIV)
                noise = _grid_embedding(fp, "i")
                emb = [
                    float(SEM_BASE_SCALE * b + n)
                    for b, n in zip(base, noise)
                ]
                rows.append((int(mid), emb))
            yield pd.DataFrame(rows, columns=["media_id", "embedding"])

    return media_df.select("media_id", "payload").mapInPandas(
        run, IMAGE_EMB_SCHEMA
    )


# ---------------------------------------------------------------------------
# Round 15: MULTIMODAL WDS samples — image + caption + FLAC audio + video
# clip in ONE tar per sample (the LAION-AV shape). The round-14 curated
# egress was image+caption only while the FLAC/VID codecs, perceptual
# hashes, and five-modality dedup card already existed; this section
# composes them into the funnel + curated egress. Content keys are
# modality-specific (audio pairs share `id div 2 * 2`, video triples share
# `id div 3 * 3`) so each dedup gate has planted drops, and two per-doc
# md5-keyed plants (QUIET audio, STATIC video) exercise the per-modality
# quality gates. Scale-extension composition class — no single reference
# counterpart (reference ingest: utils.scala:20-120 table scans).
# ---------------------------------------------------------------------------

#: audio / video CONTENT-id rules (shared with the SQL oracles)
MM_AUDIO_DIV = 2
MM_VIDEO_DIV = 3
#: planted QUIET clips: md5(doc_id) byte 0 % 8 == 0 -> PCM scale 12 (too
#: quiet for the energy gate, provably: max |sum| = 160*128*12 + bumps
#: < the 500k threshold); loud scale is the fixture default 200
MM_QUIET_MOD = 8
MM_QUIET_SCALE = 12
MM_LOUD_SCALE = 200
#: planted STATIC clips: md5(doc_id) byte 1 % 8 == 0 -> all 8 frames are
#: frame 0 (motion == 0 by byte identity)
MM_STATIC_MOD = 8
#: audio energy gate: sum(|pcm|) over the 160-sample window. Loud clips
#: sit near 64*200*160 ~ 2.0M; quiet clips are bounded above by
#: 160*128*12 + 8*150 = 246,960 — the gate separates them with margin.
MM_AUDIO_MIN_ABS = 500_000


def mm_doc_plants(doc_id: int) -> tuple[bool, bool]:
    """(quiet, static) plant flags for one document id."""
    dh = hashlib.md5(str(doc_id).encode()).digest()
    return dh[0] % MM_QUIET_MOD == 0, dh[1] % MM_STATIC_MOD == 0


def attach_wds_multimodal_payload(
    df: DataFrame, id_col: str, text_col: str, misalign_denom: int = 4
) -> DataFrame:
    """Deterministic MULTIMODAL WDS fixture: each document becomes a
    one-sample tar with FOUR members —

    - ``<key>.png``: real grayscale PNG, pixels = md5(text) tiled (same
      rule as :func:`attach_wds_image_caption_payload`),
    - ``<key>.txt``: caption, with the planted 1/``misalign_denom``
      mismatch slice (md5(text) byte 2),
    - ``<key>.flac``: real FLAC (fixed-order-2 predictor) of the planted
      near-dup PCM (``audio_hash.family_audio_samples``) keyed by the
      AUDIO content id ``doc_id div 2 * 2`` (exact-duplicate pairs), with
      the QUIET plant scaling amplitude to 12,
    - ``<key>.vid``: VID0 clip of the pan frames
      (``video_hash.family_video_frames``) keyed by the VIDEO content id
      ``doc_id div 3 * 3`` (exact-duplicate triples), with the STATIC
      plant repeating frame 0.

    Arrow map-only; ensure_parallelism is the caller's job (the funnel
    wraps the docs scan once)."""
    from azure_medicine_data_engineering_spark.operators.audio_hash import (
        family_audio_samples,
    )
    from azure_medicine_data_engineering_spark.operators.flac import (
        flac_encode_pcm16,
    )
    from azure_medicine_data_engineering_spark.operators.media_av import (
        vid_encode_gray,
    )
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        png_encode_gray,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        VID_H,
        VID_W,
        family_video_frames,
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                i = int(i)
                text = str(t)
                h = hashlib.md5(text.encode("utf-8")).digest()
                w = 4 + h[0] % 13
                ht = 4 + h[1] % 11
                n = w * ht
                pixels = (h * (n // 16 + 1))[:n]
                caption = (
                    ("mismatch " + text) if h[2] % misalign_denom == 0 else text
                )
                quiet, static = mm_doc_plants(i)
                aid = (i // MM_AUDIO_DIV) * MM_AUDIO_DIV
                pcm = family_audio_samples(
                    aid, scale=MM_QUIET_SCALE if quiet else MM_LOUD_SCALE
                )
                vid_id = (i // MM_VIDEO_DIV) * MM_VIDEO_DIV
                frames = family_video_frames(vid_id)
                if static:
                    frames = [frames[0]] * len(frames)
                key = f"{i:09d}"
                members = [
                    (f"{key}.flac", flac_encode_pcm16(8000, pcm, subframe="fixed2")),
                    (f"{key}.png", png_encode_gray(w, ht, pixels)),
                    (f"{key}.txt", caption.encode("utf-8")),
                    (f"{key}.vid", vid_encode_gray(VID_W, VID_H, frames)),
                ]
                ids.append(i)
                payloads.append(tar_write_members(members))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "wds_mm", "payload": payloads}
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    made = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(run, out_schema)
    return made.withColumn("byte_len", F.length("payload").cast("int"))


MM_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        # image <-> caption alignment state (shared integer grid)
        StructField("dot", LongType()),
        StructField("na", LongType()),
        StructField("nb", LongType()),
        StructField("fp_img", StringType()),
        StructField("caption", StringType()),
        # audio: energy gate state + 64-bit perceptual fingerprint halves
        StructField("audio_abs", LongType()),
        StructField("afp_hi", LongType()),
        StructField("afp_lo", LongType()),
        # video: moving-frame count (vs frame 0 dHash) + signature halves
        StructField("motion", IntegerType()),
        StructField("vsig_hi", LongType()),
        StructField("vsig_lo", LongType()),
    ]
)


def multimodal_sample_stats(df: DataFrame) -> DataFrame:
    """Per-sample gate statistics for ALL FOUR modalities in ONE Arrow
    pass over the tar bytes (parse once, decode every member once):

    - image/caption: decoded-pixel fingerprint, wire-extracted caption,
      integer cosine state (as :func:`image_text_alignment_stats`),
    - audio: FLAC decode -> sum(|pcm|) energy + Haitsma-Kalker
      fingerprint halves (``audio_hash.audio_fingerprint64``),
    - video: VID0 demux -> per-frame dHash; ``motion`` = how many of
      frames 1..n-1 hash differently from frame 0 (byte-identical frames
      provably hash equal, so the STATIC plant lands motion 0); plus the
      strict-majority clip signature halves.

    Map-only, no shuffle; the funnel's gates are then pure column
    predicates over this frame."""
    from azure_medicine_data_engineering_spark.operators.audio_hash import (
        audio_fingerprint64,
    )
    from azure_medicine_data_engineering_spark.operators.flac import (
        flac_decode_samples,
    )
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        dhash64,
    )
    from azure_medicine_data_engineering_spark.operators.media_av import (
        vid_decode_frames,
    )
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        png_decode_pixels,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        video_signature64,
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                by_ext: dict[str, bytes] = {}
                for name, content in tar_read_members(bytes(p)):
                    _, ext = wds_sample_key(name)
                    by_ext[ext] = content
                missing = {"png", "txt", "flac", "vid"} - set(by_ext)
                if missing:
                    raise ValueError(f"sample {mid}: missing {sorted(missing)}")
                _, _, _, pixels = png_decode_pixels(by_ext["png"])
                fp_img = bytes(pixels[:16]).hex()
                fp_txt = hashlib.md5(by_ext["txt"]).hexdigest()
                ei = _grid_embedding(fp_img, "i")
                et = _grid_embedding(fp_txt, "t")
                dot = sum(a * b for a, b in zip(ei, et))
                na = sum(a * a for a in ei)
                nb = sum(b * b for b in et)
                _, pcm = flac_decode_samples(by_ext["flac"])
                audio_abs = sum(abs(s) for s in pcm)
                afp = audio_fingerprint64(pcm)
                w, h, frames = vid_decode_frames(by_ext["vid"])
                hashes = [dhash64(w, h, fr) for fr in frames]
                motion = sum(1 for fh in hashes[1:] if fh != hashes[0])
                vsig = video_signature64(w, h, frames)
                rows.append(
                    (
                        int(mid), dot, na, nb, fp_img,
                        by_ext["txt"].decode("utf-8"),
                        audio_abs, afp >> 32, afp & 0xFFFFFFFF,
                        motion, vsig >> 32, vsig & 0xFFFFFFFF,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MM_STATS_SCHEMA.fields]
            )

    return df.select("media_id", "payload").mapInPandas(run, MM_STATS_SCHEMA)


MM_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("flac", BinaryType()),
        StructField("png", BinaryType()),
        StructField("txt", BinaryType()),
        StructField("vid", BinaryType()),
    ]
)


def extract_curated_mm_samples(
    media_df: DataFrame, survivor_ids: DataFrame
) -> DataFrame:
    """Member BYTES of the surviving multimodal samples (keyed semi-join
    + one Arrow parse pass) — the egress repackages what crossed the
    wire, never a recomputation from the source table."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                by_ext: dict[str, bytes] = {}
                for name, content in tar_read_members(bytes(p)):
                    _, ext = wds_sample_key(name)
                    by_ext[ext] = content
                rows.append(
                    (
                        int(mid), by_ext["flac"], by_ext["png"],
                        by_ext["txt"], by_ext["vid"],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MM_SAMPLE_SCHEMA.fields]
            )

    kept = media_df.join(survivor_ids.select("media_id"), "media_id", "semi")
    return kept.select("media_id", "payload").mapInPandas(
        run, MM_SAMPLE_SCHEMA
    )


def write_curated_mm_shards(
    samples_df: DataFrame, out_dir: str, samples_per_shard: int = 8
) -> DataFrame:
    """Multimodal twin of :func:`write_curated_wds_shards`: each shard tar
    carries the survivors' ``.flac/.png/.txt/.vid`` members (sparse
    ``media_id div N`` keys, per-task atomic tmp+rename landing)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    exts = ["flac", "png", "txt", "vid"]

    def build(key, pdf):
        import os as _os

        import pandas as pd

        pdf = pdf.sort_values("media_id")
        _os.makedirs(out_dir, exist_ok=True)  # executor-side (shared FS)
        members = []
        for _, row in pdf.iterrows():
            k = f"{int(row['media_id']):09d}"
            for ext in exts:
                members.append((f"{k}.{ext}", bytes(row[ext])))
        payload = tar_write_members(members)
        sid = int(key[0])
        _land_shard_tar(out_dir, sid, payload)
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "n_samples": [len(pdf)],
                "byte_len": [len(payload)],
            }
        )

    staged = samples_df.select(
        F.expr(f"cast(media_id as long) div {int(samples_per_shard)}").alias(
            "_shard"
        ),
        "media_id",
        *exts,
    )
    return staged.groupBy("_shard").applyInPandas(build, CURATED_WRITE_SCHEMA)


MM_MANIFEST_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("media_id", LongType()),
        StructField("caption_bytes", LongType()),
        StructField("caption_ck", LongType()),
        StructField("fp_ck", LongType()),
        StructField("afp_hi", LongType()),
        StructField("afp_lo", LongType()),
        StructField("vsig_hi", LongType()),
        StructField("vsig_lo", LongType()),
    ]
)


def curated_mm_manifest(spark, root: str) -> DataFrame:
    """Multimodal curated-shard MANIFEST recomputed FROM THE LANDED
    BYTES: parse every landed tar, re-decode each member (PNG pixels ->
    content fingerprint, FLAC -> PCM -> audio fingerprint, VID0 -> frames
    -> clip signature, caption md5 prefix) and aggregate per shard — a
    corruption anywhere in assemble/land/re-ingest breaks the hash
    match. Per-modality checksums are BIGINT sums of 48-bit md5 prefixes
    / 32-bit hash halves, so the oracle replays them exactly."""
    from azure_medicine_data_engineering_spark.operators.audio_hash import (
        audio_fingerprint64,
    )
    from azure_medicine_data_engineering_spark.operators.flac import (
        flac_decode_samples,
    )
    from azure_medicine_data_engineering_spark.operators.media_av import (
        vid_decode_frames,
    )
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        png_decode_pixels,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        video_signature64,
    )

    def run(batches: Iterator) -> Iterator:
        import os as _os

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                base = _os.path.basename(str(path))
                sid = int(base[len("shard-") : -len(".tar")])
                samples: dict[str, dict[str, bytes]] = {}
                for name, member in tar_read_members(bytes(content)):
                    key, ext = wds_sample_key(name)
                    samples.setdefault(key, {})[ext] = member
                for key, d in samples.items():
                    missing = {"png", "txt", "flac", "vid"} - set(d)
                    if missing:
                        raise ValueError(
                            f"{base}: sample {key} missing {sorted(missing)}"
                        )
                    _, _, _, pixels = png_decode_pixels(d["png"])
                    fp = bytes(pixels[:16]).hex()
                    cap_md5 = hashlib.md5(d["txt"]).hexdigest()
                    _, pcm = flac_decode_samples(d["flac"])
                    afp = audio_fingerprint64(pcm)
                    w, h, frames = vid_decode_frames(d["vid"])
                    vsig = video_signature64(w, h, frames)
                    rows.append(
                        (
                            sid, int(key), len(d["txt"]),
                            int(cap_md5[:12], 16), int(fp[:12], 16),
                            afp >> 32, afp & 0xFFFFFFFF,
                            vsig >> 32, vsig & 0xFFFFFFFF,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MM_MANIFEST_SCHEMA.fields]
            )

    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    members = bf.select("path", "content").mapInPandas(run, MM_MANIFEST_SCHEMA)
    return members.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum("media_id").cast("long").alias("sum_ids"),
        F.sum("caption_bytes").cast("long").alias("caption_bytes"),
        F.sum("caption_ck").cast("long").alias("caption_ck"),
        F.sum("fp_ck").cast("long").alias("fp_ck"),
        F.sum("afp_hi").cast("long").alias("afp_hi"),
        F.sum("afp_lo").cast("long").alias("afp_lo"),
        F.sum("vsig_hi").cast("long").alias("vsig_hi"),
        F.sum("vsig_lo").cast("long").alias("vsig_lo"),
    )


# ---------------------------------------------------------------------------
# Round 15: deduped shot-keyframe PNG shard egress — the video corpus's
# curated-preview artifact (one lossless PNG per unique shot keyframe),
# shard tars via the shared atomic landing, manifest from LANDED bytes.
# ---------------------------------------------------------------------------

_KF_SHARD_REPORT = "shard_id long, n_members long"


def write_keyframe_png_shards(
    kf_frames: DataFrame, out_dir: str, per_shard: int = 8
) -> DataFrame:
    """Write one PNG per surviving keyframe into WDS shard tars:
    ``kf_frames`` is ``(kf_id, frame_idx, payload)`` (the clip's VID0
    container joined to the survivor list); each grouped task decodes its
    clips' frames, losslessly PNG-encodes them, and lands
    ``shard-<kf_id div per_shard>.tar`` with members ``<kf_id 012d>.png``
    via the shared attempt-unique atomic landing (`_land_shard_tar`).
    Returns the lazy per-shard write report — the caller forces it with
    collect() and must NEVER persist it (the round-15 side-effect
    cache-substitution pitfall)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def build(key, pdf):
        import os as _os

        import pandas as pd

        from azure_medicine_data_engineering_spark.operators.media_av import (
            vid_decode_frames,
        )
        from azure_medicine_data_engineering_spark.operators.multimodal import (
            png_encode_gray,
        )

        _os.makedirs(out_dir, exist_ok=True)
        pdf = pdf.sort_values("kf_id")
        members = []
        for kf_id, fidx, payload in zip(
            pdf["kf_id"], pdf["frame_idx"], pdf["payload"]
        ):
            w, h, frames = vid_decode_frames(bytes(payload))
            png = png_encode_gray(w, h, frames[int(fidx)])
            members.append((f"{int(kf_id):012d}.png", png))
        sid = int(key[0])
        _land_shard_tar(out_dir, sid, tar_write_members(members))
        return pd.DataFrame(
            {"shard_id": [sid], "n_members": [len(members)]}
        )

    staged = kf_frames.withColumn(
        "_shard", F.expr(f"kf_id div {per_shard}")
    )
    return staged.groupBy("_shard").applyInPandas(build, _KF_SHARD_REPORT)


def keyframe_shard_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    """Re-ingest the landed keyframe shards and recompute the manifest
    FROM THE BYTES THAT CROSSED THE CONTAINER: parse each tar, decode
    each PNG to raw pixels, and emit per-shard
    ``(shard_id, n_members, sum_kf_id, sum_px_fp)`` where ``px_fp`` is
    the exact integer position-weighted pixel sum — any defect in frame
    extraction, PNG encoding, tar framing, landing, or decode breaks an
    integer."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("shard_id", LongType()),
            StructField("n_members", LongType()),
            StructField("sum_kf_id", LongType()),
            StructField("sum_px_fp", LongType()),
        ]
    )

    def parse(batches):
        import os as _os

        import pandas as pd

        from azure_medicine_data_engineering_spark.operators.multimodal import (
            png_decode_pixels,
        )

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                sid = int(
                    _os.path.basename(path).split("-")[1].split(".")[0]
                )
                n = 0
                s_id = 0
                s_fp = 0
                for name, body in tar_read_members(bytes(content)):
                    kf_id = int(name.split(".")[0])
                    w, h, _, px = png_decode_pixels(body)
                    fp = 0
                    for i, v in enumerate(px):  # sequential exact int sum
                        fp += v * (i + 1)
                    n += 1
                    s_id += kf_id
                    s_fp += fp
                rows.append((sid, n, s_id, s_fp))
            yield pd.DataFrame(
                rows,
                columns=["shard_id", "n_members", "sum_kf_id", "sum_px_fp"],
            )

    import os

    files = spark.read.format("binaryFile").load(
        os.path.join(out_dir, "shard-*.tar")
    )
    return files.select("path", "content").mapInPandas(parse, schema)
