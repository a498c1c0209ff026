"""Perceptual image hashing and banded Hamming near-duplicate search.

Round 12: the one dedup modality the engine was missing — raw-image
near-dup (the LAION / DataComp curation stage) — re-expressing the
reference's distinct-based dedup intent (fl_aud.R:21 unique()) for image
corpora the way ``operators/dedup.py`` already does for text (SimHash) and
embeddings (SemDeDup).

Two classic 64-bit perceptual hashes, both defined INTEGER-EXACT so a SQL
oracle can replay them bit-for-bit (no float drift, no engine-specific
rounding):

* **dHash** (difference hash): integer area-average downsample to an
  8-row x 9-column grid, one bit per horizontally adjacent cell pair —
  ``bit = 1 iff left block mean > right block mean``, compared
  cross-multiplied (``sum_l * n_r > sum_r * n_l``) so unequal block sizes
  never divide.
* **pHash** (DCT hash, imagehash/pHash.org shape): integer area-average
  downsample to 32x32 (cell value ``v = (256 * sum) // n`` — floor on the
  1/256 grid), separable 2-D DCT-II in FIXED-POINT arithmetic (Q15 integer
  cosine table, snapped half-up per the repo convention), top-left 8x8
  coefficient block, bit ``i = 1 iff 2*coef_i > s[31] + s[32]`` where ``s``
  is the ascending sort (the exact even-count median test, kept integral).
  Integer DCT keeps every intermediate exact in BIGINT (|coef| <= ~7.2e16)
  and makes the separable factorization bit-identical to the direct double
  sum — associativity is exact on integers.

Hash bit ``i`` (0 = most significant) maps to grid cell ``row*8 + col``
(dHash) / coefficient ``u*8 + v`` (pHash); the 64-bit value is carried as
two non-negative BIGINT halves ``(hi, lo)`` = bits 63..32 / 31..0, which
both Spark and DuckDB can band, XOR, and popcount without signed-overflow
hazards.

Near-dup search is the same pigeonhole discipline as
``dedup.simhash_near_pairs``: 4 bands of 16 bits, so any pair within
Hamming distance <= 3 agrees exactly on at least one band — candidate
generation is an equi-join on ``(band, chunk)``, verification is
``bit_count(xor)``, recall is EXACT, and the plan is one shuffle on the
band key with bucket-local pairing. **Never all-pairs**: at 100 TB the
hash table is fact-sized but each bucket holds only genuine candidates.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


class ImageHashError(ValueError):
    """Typed error surface for undersized / non-grayscale inputs."""


# Q15 fixed-point DCT-II cosine table: C[u][x] = cos(pi*(2x+1)*u/64) * 2^15,
# snapped half-up (floor(x+0.5) — the repo's half-away convention for
# positive-magnitude snaps; table values are inlined into the SQL oracle as
# literals, so there is exactly ONE source of truth for both engines).
PHASH_N = 32
PHASH_COS_Q15: list[list[int]] = [
    [
        math.floor(math.cos(math.pi * (2 * x + 1) * u / (2 * PHASH_N)) * 32768 + 0.5)
        for x in range(PHASH_N)
    ]
    for u in range(8)
]


def _block_ranges(total: int, parts: int) -> list[tuple[int, int]]:
    """Integer area-mapping block bounds: part p covers
    [p*total//parts, (p+1)*total//parts) — the same index math as
    multimodal.png_resize_nearest, exact for any size."""
    return [(p * total // parts, (p + 1) * total // parts) for p in range(parts)]


def dhash64(width: int, height: int, pixels: bytes) -> int:
    """64-bit difference hash of a row-major grayscale image (see module
    docstring for the exact integer spec). Raises :class:`ImageHashError`
    when the image is too small to fill the 8x9 grid."""
    if width < 9 or height < 8:
        raise ImageHashError(f"dhash needs >= 9x8 pixels, got {width}x{height}")
    rows = _block_ranges(height, 8)
    cols = _block_ranges(width, 9)
    sums = [[0] * 9 for _ in range(8)]
    ns = [[0] * 9 for _ in range(8)]
    for i, (r0, r1) in enumerate(rows):
        for j, (c0, c1) in enumerate(cols):
            s = 0
            for r in range(r0, r1):
                base = r * width
                for c in range(c0, c1):
                    s += pixels[base + c]
            sums[i][j] = s
            ns[i][j] = (r1 - r0) * (c1 - c0)
    h = 0
    for i in range(8):
        for j in range(8):
            bit = 1 if sums[i][j] * ns[i][j + 1] > sums[i][j + 1] * ns[i][j] else 0
            h = (h << 1) | bit
    return h


def phash64(width: int, height: int, pixels: bytes) -> int:
    """64-bit DCT perceptual hash (fixed-point spec in the module
    docstring). Raises :class:`ImageHashError` below 32x32."""
    if width < PHASH_N or height < PHASH_N:
        raise ImageHashError(
            f"phash needs >= {PHASH_N}x{PHASH_N} pixels, got {width}x{height}"
        )
    rows = _block_ranges(height, PHASH_N)
    cols = _block_ranges(width, PHASH_N)
    # integer area average on the 1/256 grid: v = (256 * sum) // n
    v = [[0] * PHASH_N for _ in range(PHASH_N)]
    for x, (r0, r1) in enumerate(rows):
        for y, (c0, c1) in enumerate(cols):
            s = 0
            for r in range(r0, r1):
                base = r * width
                for c in range(c0, c1):
                    s += pixels[base + c]
            v[x][y] = (256 * s) // ((r1 - r0) * (c1 - c0))
    # separable fixed-point DCT: rows first (t[u][y]), then columns
    t = [[0] * PHASH_N for _ in range(8)]
    for u in range(8):
        cu = PHASH_COS_Q15[u]
        for y in range(PHASH_N):
            acc = 0
            for x in range(PHASH_N):
                acc += v[x][y] * cu[x]
            t[u][y] = acc
    coefs = []
    for u in range(8):
        tu = t[u]
        for vv in range(8):
            cv = PHASH_COS_Q15[vv]
            acc = 0
            for y in range(PHASH_N):
                acc += tu[y] * cv[y]
            coefs.append(acc)
    s = sorted(coefs)
    thr2 = s[31] + s[32]
    h = 0
    for c in coefs:
        h = (h << 1) | (1 if 2 * c > thr2 else 0)
    return h


# fixture constants shared with the SQL oracle generator (queries side)
FIXTURE_Q = 256  # bilinear sub-cell resolution
FIXTURE_PATCH = 6  # variant perturbation patch (top-left, PATCH x PATCH)
FIXTURE_AMP = 2  # per-variant intensity step inside the patch


def family_fixture_pixels(
    doc_id: int, width: int, height: int, family_div: int = 4, variant_mod: int = 4
) -> bytes:
    """Pixels of the planted-near-dup fixture for one document — the single
    source of truth the Spark attach kernel and the pytest references call;
    the SQL oracle replays the same closed form from the md5 hex.

    Spec (all-integer, so any engine replays it exactly): docs sharing
    ``id // family_div`` share a 4x4 lattice ``L[k] = md5_byte[k]*15//16``
    (<= 239, leaving perturbation headroom); the image is BILINEAR VALUE
    NOISE — lattice upsampled to ``width x height`` with Q=256 sub-cell
    weights — so each family has genuine, family-specific low-frequency
    energy (md5-tiled noise images make all low-freq DCT coefficients
    near-zero and pHash degenerates to coin flips; measured cross-family
    Hamming collapsed to ~8 before this design, ~31 after). The doc's
    variant ``id % variant_mod`` adds ``variant * FIXTURE_AMP`` over the
    top-left ``FIXTURE_PATCH``-square — a small localized bump, so
    same-family pairs land within a few Hamming bits while cross-family
    pairs sit near the random-64-bit distance."""
    q = FIXTURE_Q
    lat = [b * 15 // 16 for b in hashlib.md5(str(doc_id // family_div).encode()).digest()]
    bump = (doc_id % variant_mod) * FIXTURE_AMP
    px = bytearray(width * height)
    for p in range(width * height):
        r, c = divmod(p, width)
        fu = r * 3 * q // (height - 1)
        fv = c * 3 * q // (width - 1)
        u0, du = divmod(fu, q)
        v0, dv = divmod(fv, q)
        u1 = min(u0 + 1, 3)
        v1 = min(v0 + 1, 3)
        val = (
            (q - du) * (q - dv) * lat[u0 * 4 + v0]
            + du * (q - dv) * lat[u1 * 4 + v0]
            + (q - du) * dv * lat[u0 * 4 + v1]
            + du * dv * lat[u1 * 4 + v1]
        ) // (q * q)
        if r < FIXTURE_PATCH and c < FIXTURE_PATCH:
            val += bump
        px[p] = val
    return bytes(px)


def attach_family_png_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    width: int = 36,
    height: int = 32,
    family_div: int = 4,
    variant_mod: int = 4,
) -> DataFrame:
    """Deterministic REAL-PNG fixture with PLANTED near-duplicates (see
    :func:`family_fixture_pixels` for the pixel spec). Family size is
    CONSTANT (``family_div``), so planted-pair volume grows linearly with
    the corpus — no quadratic clone pathology at the 10x/100x replicas,
    and the replica tool's key offsets mint fresh families. Payloads are
    genuine PNG files (``png_encode_gray``); the hash kernel decodes the
    full wire format, so an oracle hash match certifies the encode ->
    IDAT -> defilter -> hash chain end to end. Arrow-batched mapInPandas,
    no shuffle."""
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        attach_media_payload,
        png_encode_gray,
    )

    made = attach_media_payload(
        df,
        id_col,
        "image",
        lambda i: png_encode_gray(
            width,
            height,
            family_fixture_pixels(i, width, height, family_div, variant_mod),
        ),
    )
    return made.withColumn("byte_len", F.length("payload").cast("int"))


_HASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash_hi", LongType()),
        StructField("dhash_lo", LongType()),
        StructField("phash_hi", LongType()),
        StructField("phash_lo", LongType()),
        StructField("dhash_hex", StringType()),
        StructField("phash_hex", StringType()),
    ]
)


def image_perceptual_hashes(media_df: DataFrame) -> DataFrame:
    """Decode each grayscale PNG payload and emit both perceptual hashes as
    ``(hi, lo)`` BIGINT halves plus display hex. Map-only Arrow pass — the
    expensive per-image work happens exactly once, the downstream pair
    search touches only the tiny hash columns."""
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        png_decode_pixels,
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in _HASH_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, px = png_decode_pixels(payload)
                if ch != 1:
                    raise ImageHashError(f"grayscale expected, got {ch} channels")
                dh = dhash64(w, h, px)
                ph = phash64(w, h, px)
                out["media_id"].append(int(mid))
                out["dhash_hi"].append(dh >> 32)
                out["dhash_lo"].append(dh & 0xFFFFFFFF)
                out["phash_hi"].append(ph >> 32)
                out["phash_lo"].append(ph & 0xFFFFFFFF)
                out["dhash_hex"].append(f"{dh:016x}")
                out["phash_hex"].append(f"{ph:016x}")
            yield pd.DataFrame(out)

    return media_df.mapInPandas(run, _HASH_SCHEMA)


def _band_chunks(hi_col: str, lo_col: str) -> list:
    """The 4x16-bit band chunk expressions of a 64-bit (hi, lo) hash —
    the ONE definition of the banding scheme, shared by the self-join
    (:func:`hamming_near_pairs`) and cross-join
    (:func:`hamming_cross_matches`) searches."""
    return [
        F.shiftrightunsigned(hi_col, 16),
        F.col(hi_col).bitwiseAND(F.lit(0xFFFF)),
        F.shiftrightunsigned(lo_col, 16),
        F.col(lo_col).bitwiseAND(F.lit(0xFFFF)),
    ]


def hamming_near_pairs(
    hashes: DataFrame,
    hi_col: str,
    lo_col: str,
    id_col: str = "media_id",
    max_hamming: int = 3,
    cache: bool = True,
) -> DataFrame:
    """Near-duplicate pairs over a 64-bit hash column split as
    ``(hi_col, lo_col)``: 4 bands of 16 bits -> equi-join candidates ->
    exact ``bit_count(xor)`` verification. Recall is EXACT for
    ``max_hamming <= 3`` by pigeonhole (<= 3 differing bits touch <= 3 of
    the 4 bands). Output ``(id_a, id_b, hamming)`` with ``id_a < id_b``.

    The hash frame is persisted (when ``cache``) so the Arrow decode+hash
    lineage runs once, not once per self-join side; callers owning a
    longer-lived frame pass ``cache=False``. At 100 TB the equivalent is
    materializing the hash table before the self-join."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(f"exact recall needs 0 <= max_hamming <= 3, got {max_hamming}")
    sk = hashes.select(
        F.col(id_col),
        F.col(hi_col).alias("h_hi"),
        F.col(lo_col).alias("h_lo"),
    )
    if cache:
        sk = sk.persist()
    chunks = [
        c.alias(f"c{b}") for b, c in enumerate(_band_chunks("h_hi", "h_lo"))
    ]
    banded = sk.select(F.col(id_col), "h_hi", "h_lo", *chunks).select(
        F.col(id_col),
        "h_hi",
        "h_lo",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"c{b}").alias("chunk"))
                    for b in range(4)
                ]
            )
        ).alias("bc"),
    ).select(id_col, "h_hi", "h_lo", "bc.band", "bc.chunk")
    left = banded.alias("l")
    right = banded.alias("r")
    out = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            (
                F.bit_count(F.col("l.h_hi").bitwiseXOR(F.col("r.h_hi")))
                + F.bit_count(F.col("l.h_lo").bitwiseXOR(F.col("r.h_lo")))
            )
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    if cache:
        out._stage_caches = [sk]
    return out


def hamming_cross_matches(
    left: DataFrame,
    right: DataFrame,
    hi_col: str,
    lo_col: str,
    id_col: str = "media_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Banded Hamming matches BETWEEN two hash frames (round 12): the
    incremental-ingest shape — a NEW batch probes the existing CORPUS
    hash table and the corpus is NEVER self-joined (the
    ``dedup.incremental_dedup_flags`` discipline applied to perceptual
    hashes). Same 4x16-bit pigeonhole bands, exact recall for
    ``max_hamming <= 3``. Returns ``(id_l, id_r, hamming)``."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(f"exact recall needs 0 <= max_hamming <= 3, got {max_hamming}")

    def banded(df: DataFrame, side: str) -> DataFrame:
        sk = df.select(
            F.col(id_col).alias(f"id_{side}"),
            F.col(hi_col).alias(f"hi_{side}"),
            F.col(lo_col).alias(f"lo_{side}"),
        )
        return sk.select(
            f"id_{side}",
            f"hi_{side}",
            f"lo_{side}",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("band"), c.alias("chunk"))
                        for b, c in enumerate(
                            _band_chunks(f"hi_{side}", f"lo_{side}")
                        )
                    ]
                )
            ).alias("bc"),
        ).select(f"id_{side}", f"hi_{side}", f"lo_{side}", "bc.band", "bc.chunk")

    lb = banded(left, "l")
    rb = banded(right, "r")
    return (
        lb.join(rb, ["band", "chunk"])
        .select(
            "id_l",
            "id_r",
            (
                F.bit_count(F.col("hi_l").bitwiseXOR(F.col("hi_r")))
                + F.bit_count(F.col("lo_l").bitwiseXOR(F.col("lo_r")))
            )
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def corpus_match_report(
    new_docs: DataFrame,
    h_corp: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    hi_col: str = "phash_hi",
    lo_col: str = "phash_lo",
) -> DataFrame:
    """Per-new-image corpus match report ``(new_id, n_corpus_matches,
    min_hamming, is_near_dup)`` — encode+hash the NEW slice, probe the
    existing corpus hash table via the banded cross match (corpus never
    self-joins), left-join back so clean images report (0, -1, false).
    Factored out in round 13 so the batch query
    (`incremental_image_dedup_batch`) and its streaming twin run the
    IDENTICAL report per (micro-)batch: each new image's verdict depends
    only on the static corpus, so the output is invariant to how the
    stream is split into batches."""
    h_new = image_perceptual_hashes(
        attach_family_png_payload(new_docs, id_col, width, height)
    )
    matches = hamming_cross_matches(h_new, h_corp, hi_col, lo_col)
    agg = matches.groupBy("id_l").agg(
        F.count(F.lit(1)).cast("long").alias("nm"),
        F.min("hamming").cast("int").alias("mh"),
    )
    return (
        new_docs.select(F.col(id_col).alias("new_id"))
        .join(agg, F.col("new_id") == F.col("id_l"), "left")
        .select(
            "new_id",
            F.coalesce(F.col("nm"), F.lit(0)).cast("long").alias("n_corpus_matches"),
            F.coalesce(F.col("mh"), F.lit(-1)).cast("int").alias("min_hamming"),
            F.col("nm").isNotNull().alias("is_near_dup"),
        )
    )
