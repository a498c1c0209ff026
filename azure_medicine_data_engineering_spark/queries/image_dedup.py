"""Image perceptual-hash near-dup queries (round 12 — the LAION/DataComp
image-dedup curation stage; see ``operators/image_hash.py``).

Oracle strategy: the PNG fixture pixels are a CLOSED FORM of doc_id (md5
lattice -> integer bilinear value noise -> variant bump), and both hashes
are defined all-integer (cross-multiplied block compares; Q15 fixed-point
DCT whose cosine table is computed ONCE in Python and inlined into the SQL
as literals — zero cross-engine float surface). The oracle therefore
replays pixel -> hash -> banded pair search bit-for-bit: a hash match
certifies the whole Spark chain (PNG encode -> IDAT -> defilter -> hash ->
band join) end to end.

Oracle scale shape: the expensive pixel/DCT work runs once per FAMILY
(``doc_id // 4`` — n/4 rows), and each doc folds its variant bump through
the hash algebra as a precomputed integer delta (the bump is linear
through the area averages and the DCT, and every ``//`` floor it crosses
is exact because 256 is divisible by the 1-or-2 cell widths), so per-doc
work is 64 comparisons, not a 1152-pixel rebuild. The bilinear weights and
lattice indices are position constants — inlined as literal lists rather
than re-derived per pixel. Together this keeps the oracle sweepable at the
10x replica.

The pair oracles mirror the operator's 4x16-bit band join rather than the
O(n^2) brute force; the two are provably identical for Hamming <= 3 by
pigeonhole (<= 3 differing bits touch <= 3 of 4 bands), and
``tests/test_image_hash.py`` pins band-join == brute-force equality on a
controlled corpus, so the oracle stays an equi-join that survives the
10x/100x replica sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from azure_medicine_data_engineering_spark.operators.image_hash import (
    FIXTURE_AMP,
    FIXTURE_PATCH,
    FIXTURE_Q,
    PHASH_COS_Q15,
    _block_ranges,
)
from azure_medicine_data_engineering_spark.queries.registry import (
    register,
    table as _t,
)

# natural fixture sizes: 36x32 makes the dHash 8x9 grid exact 4x4 blocks;
# 32x32 makes the pHash downsample the identity
DH_W, DH_H = 36, 32
PH_W, PH_H = 32, 32

_CT_LITERAL = str([v for row in PHASH_COS_Q15 for v in row])


def _bilerp_tables(w: int, h: int) -> tuple[list[int], ...]:
    """Per-pixel lattice indices (0-based) and Q16 weights of the bilinear
    value-noise fixture — position constants mirroring
    ``image_hash.family_fixture_pixels``."""
    q = FIXTURE_Q
    i00, i10, i01, i11 = [], [], [], []
    w00, w10, w01, w11 = [], [], [], []
    for p in range(w * h):
        r, c = divmod(p, w)
        fu = r * 3 * q // (h - 1)
        fv = c * 3 * q // (w - 1)
        u0, du = divmod(fu, q)
        v0, dv = divmod(fv, q)
        u1, v1 = min(u0 + 1, 3), min(v0 + 1, 3)
        i00.append(u0 * 4 + v0)
        i10.append(u1 * 4 + v0)
        i01.append(u0 * 4 + v1)
        i11.append(u1 * 4 + v1)
        w00.append((q - du) * (q - dv))
        w10.append(du * (q - dv))
        w01.append((q - du) * dv)
        w11.append(du * dv)
    return i00, i10, i01, i11, w00, w10, w01, w11


def _family_px_ctes(
    w: int, h: int, id_expr: str = "doc_id", prefix: str = ""
) -> str:
    """CTEs ``fam``/``lat``/``wt``/``px``: base (bump-free) pixels per
    FAMILY — the per-doc variant is applied downstream as a hash-space
    delta, never as a pixel rebuild. ``id_expr``/``prefix`` (round 15)
    let the multimodal funnel re-key the content id and avoid CTE-name
    collisions; defaults reproduce the round-12 SQL byte-identically."""
    p = prefix
    i00, i10, i01, i11, w00, w10, w01, w11 = _bilerp_tables(w, h)
    return f"""
    {p}fam AS MATERIALIZED (SELECT DISTINCT {id_expr} // 4 AS f FROM documents),
    {p}lat AS MATERIALIZED (
      SELECT f, list_transform(range(16), k ->
               CAST(('0x' || substr(md5(CAST(f AS VARCHAR)),
                                    k * 2 + 1, 2)) AS INT) * 15 // 16) AS B
      FROM {p}fam
    ),
    {p}wt AS (SELECT {i00} AS I00, {i10} AS I10, {i01} AS I01, {i11} AS I11,
                  {w00} AS W00, {w10} AS W10, {w01} AS W01, {w11} AS W11),
    {p}px AS MATERIALIZED (
      SELECT f, list_transform(range({w * h}), p ->
        (W00[p + 1] * B[I00[p + 1] + 1] + W10[p + 1] * B[I10[p + 1] + 1]
         + W01[p + 1] * B[I01[p + 1] + 1] + W11[p + 1] * B[I11[p + 1] + 1])
        // {FIXTURE_Q * FIXTURE_Q}) AS g
      FROM {p}lat, {p}wt
    )"""


def _patch_block_counts(w: int, h: int) -> list[int]:
    """Patch-pixel count per dHash block: how many perturbed pixels
    (r < PATCH, c < PATCH) fall in block (i, j) — the bump's exact
    contribution to each block sum."""
    rows = _block_ranges(h, 8)
    cols = _block_ranges(w, 9)
    out = []
    for r0, r1 in rows:
        nr = max(0, min(r1, FIXTURE_PATCH) - r0)
        for c0, c1 in cols:
            nc = max(0, min(c1, FIXTURE_PATCH) - c0)
            out.append(nr * nc)
    return out


def _phash_patch_deltas(w: int, h: int) -> list[int]:
    """Per-coefficient DCT delta of a unit bump over the patch, exact on
    integers: dcoef(u, v) = (sum_{x cells in patch rows} CT[u][x]) *
    (sum_y dV(y) * CT[v][y]) where dV(y) = 256 * k_y // CW_y is the exact
    cell-value shift (256 divisible by every cell width, so the floor in
    v = 256*sum // n commutes with the bump)."""
    rows = _block_ranges(h, 32)
    cols = _block_ranges(w, 32)
    # rows: fixture heights are 32 -> identity; patch rows are x < PATCH,
    # but keep it general via overlap counts (must be all-or-nothing for
    # exactness through the row sum — true when h == 32)
    row_in = [max(0, min(r1, FIXTURE_PATCH) - r0) for r0, r1 in rows]
    assert all(k in (0, r1 - r0) for k, (r0, r1) in zip(row_in, rows)), (
        "partial patch rows would break bump linearity"
    )
    dv = []
    for c0, c1 in cols:
        k = max(0, min(c1, FIXTURE_PATCH) - c0)
        n = c1 - c0
        assert (256 * k) % n == 0
        dv.append(256 * k // n)
    out = []
    for u in range(8):
        su = sum(PHASH_COS_Q15[u][x] for x, k in enumerate(row_in) if k)
        for v in range(8):
            tv = sum(d * PHASH_COS_Q15[v][y] for y, d in enumerate(dv))
            out.append(su * tv)
    return out


def _bits_to_halves(bit_expr: str) -> str:
    """hi/lo BIGINT halves from a 64-bit MSB-first bit expression over the
    placeholder @I@ (global bit index)."""
    hi = bit_expr.replace("@I@", "i")
    lo = bit_expr.replace("@I@", "(i + 32)")
    shift = "(CAST(1 AS BIGINT) << CAST(31 - i AS INT))"
    return (
        f"CAST(list_sum(list_transform(range(32), i -> ({hi}) * {shift}))"
        f" AS BIGINT) AS hi,\n"
        f"      CAST(list_sum(list_transform(range(32), i -> ({lo}) * {shift}))"
        f" AS BIGINT) AS lo"
    )


def _dhash_hv_ctes(w: int, h: int) -> str:
    """Family block sums + per-doc bit assembly with the bump delta."""
    pb = _patch_block_counts(w, h)
    bw, bh = w // 9, h // 8
    assert bw * 9 == w and bh * 8 == h, "exact-block fixture expected"
    n_blk = bw * bh
    bit = (
        f"CASE WHEN s[(@I@ // 8) * 9 + @I@ % 8 + 1]"
        f" + bump * PB[(@I@ // 8) * 9 + @I@ % 8 + 1]"
        f" > s[(@I@ // 8) * 9 + @I@ % 8 + 2]"
        f" + bump * PB[(@I@ // 8) * 9 + @I@ % 8 + 2] THEN 1 ELSE 0 END"
    )
    return f"""
    bs AS MATERIALIZED (
      SELECT f, list_transform(range(72), b ->
        list_sum(list_transform(range({n_blk}), t ->
          g[((b // 9) * {bh} + t // {bw}) * {w}
            + (b % 9) * {bw} + t % {bw} + 1]))) AS s
      FROM px
    ),
    pb AS (SELECT {pb} AS PB),
    dbs AS MATERIALIZED (
      SELECT d.doc_id, s, (d.doc_id % 4) * {FIXTURE_AMP} AS bump
      FROM documents d, bs WHERE bs.f = d.doc_id // 4
    ),
    hv AS MATERIALIZED (
      SELECT doc_id, {_bits_to_halves(bit)}
      FROM dbs, pb
    )"""


def _phash_hv_ctes(w: int, h: int, hv_name: str = "hv") -> str:
    """Family fixed-point DCT coefficients + per-doc bump delta, median
    test, and bit assembly. Handles the general column downsample
    (w > 32) via exact 256-grid cell values."""
    kp = _phash_patch_deltas(w, h)
    cols = _block_ranges(w, 32)
    if w == 32:
        vexpr = "256 * g[x * 32 + q % 32 + 1]"
        vp_cte = ""
        tt_src = "px"
    else:
        co_off = [c0 for c0, _ in cols]
        cw = [c1 - c0 for c0, c1 in cols]
        vp_cte = f"""
    vt AS (SELECT {co_off} AS CO, {cw} AS CW),
    vp AS MATERIALIZED (
      SELECT f, list_transform(range(1024), p ->
        256 * list_sum(g[(p // 32) * {w} + CO[p % 32 + 1] + 1 :
                         (p // 32) * {w} + CO[p % 32 + 1] + CW[p % 32 + 1]])
          // CW[p % 32 + 1]) AS v
      FROM px, vt
    ),"""
        vexpr = "v[x * 32 + q % 32 + 1]"
        tt_src = "vp"
    bit = (
        f"CASE WHEN 2 * (c_arr[@I@ + 1] + bump * KP[@I@ + 1])"
        f" > s[32] + s[33] THEN 1 ELSE 0 END"
    )
    return f"""{vp_cte}
    ct AS (SELECT {_CT_LITERAL} AS CT),
    tt AS MATERIALIZED (
      SELECT f, list_transform(range(256), q ->
        list_sum(list_transform(range(32), x ->
          {vexpr} * CT[(q // 32) * 32 + x + 1]))) AS t
      FROM {tt_src}, ct
    ),
    fco AS MATERIALIZED (
      SELECT f, list_transform(range(64), uv ->
        list_sum(list_transform(range(32), y ->
          t[(uv // 8) * 32 + y + 1] * CT[(uv % 8) * 32 + y + 1]))) AS c_arr
      FROM tt, ct
    ),
    kp AS (SELECT {kp} AS KP),
    dth AS MATERIALIZED (
      SELECT d.doc_id, c_arr, (d.doc_id % 4) * {FIXTURE_AMP} AS bump,
             list_sort(list_transform(range(64), i ->
               c_arr[i + 1] + (d.doc_id % 4) * {FIXTURE_AMP} * KP[i + 1])) AS s
      FROM documents d JOIN fco ON fco.f = d.doc_id // 4, kp
    ),
    {hv_name} AS MATERIALIZED (
      SELECT doc_id, {_bits_to_halves(bit)}
      FROM dth, kp
    )"""


_PAIRS_TAIL = """
    bands AS MATERIALIZED (
      SELECT doc_id, hi, lo,
             unnest([hi // 65536, hi % 65536, lo // 65536, lo % 65536]) AS chunk,
             unnest([0, 1, 2, 3]) AS band
      FROM hv
    )
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
           CAST(bit_count(xor(l.hi, r.hi)) + bit_count(xor(l.lo, r.lo)) AS INT)
             AS hamming
    FROM bands l JOIN bands r
      ON l.band = r.band AND l.chunk = r.chunk AND l.doc_id < r.doc_id
    WHERE bit_count(xor(l.hi, r.hi)) + bit_count(xor(l.lo, r.lo)) <= 3
"""


def _hashed_pairs(
    spark: SparkSession, sf_dir: str, w: int, h: int, hi: str, lo: str
) -> DataFrame:
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        attach_family_png_payload,
        hamming_near_pairs,
        image_perceptual_hashes,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_family_png_payload(docs, "doc_id", w, h)
    hashes = image_perceptual_hashes(media)
    return hamming_near_pairs(hashes, hi, lo, "media_id", max_hamming=3)


@register(
    "image_dhash_near_pairs",
    f"WITH {_family_px_ctes(DH_W, DH_H)},{_dhash_hv_ctes(DH_W, DH_H)},{_PAIRS_TAIL}",
)
def q_image_dhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dHash near-duplicate image pairs at Hamming <= 3 over planted
    family fixtures — PNG wire -> integer dHash -> 4x16-bit banded join
    (exact recall by pigeonhole). Extends the dedup family
    (`operators/dedup.py`, re-expressing fl_aud.R:21 unique()) to the
    raw-image modality."""
    return _hashed_pairs(spark, sf_dir, DH_W, DH_H, "dhash_hi", "dhash_lo")


@register(
    "image_phash_near_pairs",
    f"WITH {_family_px_ctes(PH_W, PH_H)},{_phash_hv_ctes(PH_W, PH_H)},{_PAIRS_TAIL}",
)
def q_image_phash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash (fixed-point DCT) near-duplicate image pairs at Hamming <= 3
    — robust to the re-encode/brightness perturbations dHash block means
    smooth over; same banded exact-recall search."""
    return _hashed_pairs(spark, sf_dir, PH_W, PH_H, "phash_hi", "phash_lo")


@register(
    "image_hash_codes",
    f"""WITH {_family_px_ctes(DH_W, DH_H)},{_dhash_hv_ctes(DH_W, DH_H)},
    {_phash_hv_ctes(DH_W, DH_H, hv_name="phv")}
    SELECT d.doc_id AS media_id,
           printf('%08x%08x', d.hi, d.lo) AS dhash_hex,
           printf('%08x%08x', p.hi, p.lo) AS phash_hex
    FROM hv d JOIN phv p USING (doc_id)
    """,
)
def q_image_hash_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 64-bit dHash + pHash hex codes — pins the exact bit
    patterns (not just pair structure), through the general integer
    area-downsample path (36 -> 32 columns)."""
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        attach_family_png_payload,
        image_perceptual_hashes,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_family_png_payload(docs, "doc_id", DH_W, DH_H)
    return image_perceptual_hashes(media).select(
        "media_id", "dhash_hex", "phash_hex"
    )


@register(
    "image_dhash_dedup_groups",
    f"""WITH {_family_px_ctes(DH_W, DH_H)},{_dhash_hv_ctes(DH_W, DH_H)}
    SELECT printf('%08x%08x', hi, lo) AS dhash_hex,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS representative
    FROM hv GROUP BY hi, lo HAVING COUNT(*) >= 2
    """,
)
def q_image_dhash_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dHash duplicate GROUPS — the image sibling of
    ``exact_dedup_groups`` and the LINEAR-scale production dedup path:
    one groupBy on the 64-bit hash (copies collapse to a count + min-id
    representative), no pair enumeration. The round-12 100x diagnosis
    motivates it: smooth images make dHash bits spatially correlated
    (127,576 distinct hashes across 500k images at the perturbed 100x
    replica; one 16-bit band chunk shared by 88k images), so the
    pair-emitting query's candidate mass grows quadratically in the
    natural collision load while this collapse stays one shuffle at any
    scale. pHash's median threshold keeps its bands balanced (top chunk
    6.8k there), so near-dup PAIR search at 100 TB should run pHash-first
    and reserve dHash for group-collapse or verify stages."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.image_hash import (
        attach_family_png_payload,
        image_perceptual_hashes,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_family_png_payload(docs, "doc_id", DH_W, DH_H)
    return (
        image_perceptual_hashes(media)
        .groupBy("dhash_hex")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("media_id").cast("long").alias("representative"),
        )
        .where(F.col("n_copies") >= 2)
    )


@register(
    "image_phash_dedup_clusters",
    f"""
    WITH RECURSIVE {_family_px_ctes(PH_W, PH_H)},{_phash_hv_ctes(PH_W, PH_H)},
    bands AS MATERIALIZED (
      SELECT doc_id, hi, lo,
             unnest([hi // 65536, hi % 65536, lo // 65536, lo % 65536]) AS chunk,
             unnest([0, 1, 2, 3]) AS band
      FROM hv
    ),
    prs AS MATERIALIZED (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.chunk = r.chunk AND l.doc_id < r.doc_id
      WHERE bit_count(xor(l.hi, r.hi)) + bit_count(xor(l.lo, r.lo)) <= 3
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM prs
      UNION ALL SELECT id_b, id_a FROM prs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    mins AS (SELECT src AS id, MIN(dst) AS mr FROM reach GROUP BY src)
    SELECT LEAST(d.doc_id, COALESCE(m.mr, d.doc_id)) AS cluster_id,
           d.doc_id,
           d.doc_id = LEAST(d.doc_id, COALESCE(m.mr, d.doc_id)) AS is_representative
    FROM documents d LEFT JOIN mins m ON d.doc_id = m.id
    """,
)
def q_image_phash_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash near-dup pairs resolved into image dedup CLUSTERS via the
    shared min-label-propagation connected components
    (`operators/clusters.py:dedup_clusters` — the same resolution the text
    LSH family uses): every image appears once, representative = min id,
    singletons keep themselves. Completes the image modality's parity with
    text/embedding dedup (pairs -> clusters -> representatives). Oracle:
    recursive-CTE transitive closure over the identical banded pair set."""
    from azure_medicine_data_engineering_spark.operators.clusters import (
        dedup_clusters,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = _hashed_pairs(spark, sf_dir, PH_W, PH_H, "phash_hi", "phash_lo")
    out = dedup_clusters(docs.select("doc_id"), pairs)
    # propagate the pairs frame's persisted hash frame so the gate/bench
    # harness unpersists it (stage-cache convention)
    out._stage_caches = list(getattr(pairs, "_stage_caches", []))
    return out


#: shared by the batch query and its streaming twin (identical report
#: per construction - each new image is judged against the static corpus
#: only, so micro-batch splits cannot change the output).
_INCR_IMAGE_ORACLE = f"""WITH {_family_px_ctes(PH_W, PH_H)},{_phash_hv_ctes(PH_W, PH_H)},
    bands AS MATERIALIZED (
      SELECT doc_id, hi, lo,
             unnest([hi // 65536, hi % 65536, lo // 65536, lo % 65536]) AS chunk,
             unnest([0, 1, 2, 3]) AS band
      FROM hv
    ),
    m AS MATERIALIZED (
      SELECT DISTINCT n.doc_id AS nid, c.doc_id AS cid,
             bit_count(xor(n.hi, c.hi)) + bit_count(xor(n.lo, c.lo)) AS ham
      FROM bands n JOIN bands c ON n.band = c.band AND n.chunk = c.chunk
      WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
        AND bit_count(xor(n.hi, c.hi)) + bit_count(xor(n.lo, c.lo)) <= 3
    ),
    agg AS (
      SELECT nid, CAST(COUNT(*) AS BIGINT) AS nm, CAST(MIN(ham) AS INT) AS mh
      FROM m GROUP BY nid
    )
    SELECT d.doc_id AS new_id,
           COALESCE(nm, 0) AS n_corpus_matches,
           COALESCE(mh, -1) AS min_hamming,
           nm IS NOT NULL AS is_near_dup
    FROM documents d LEFT JOIN agg ON d.doc_id = agg.nid
    WHERE d.doc_id % 10 = 0
    """


@register(
    "incremental_image_dedup_batch",
    _INCR_IMAGE_ORACLE,
)
def q_incremental_image_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time IMAGE dedup of a new batch (doc_id%10==0 stands in
    for the arriving slice) against the existing corpus — pHash bands
    probed NEW x CORPUS only, the corpus is never self-joined
    (`image_hash.hamming_cross_matches`; the incremental_dedup_new_batch
    discipline applied to perceptual hashes). Every new image reports its
    corpus match count, closest Hamming distance (-1 = clean), and the
    near-dup flag."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.image_hash import (
        attach_family_png_payload,
        corpus_match_report,
        image_perceptual_hashes,
    )

    docs = _t(spark, sf_dir, "documents")
    new_docs = docs.where(F.col("doc_id") % 10 == 0)
    corp_docs = docs.where(F.col("doc_id") % 10 != 0)
    h_corp = image_perceptual_hashes(
        attach_family_png_payload(corp_docs, "doc_id", PH_W, PH_H)
    )
    return corpus_match_report(new_docs, h_corp, PH_W, PH_H)


@register(
    "streaming_image_dedup",
    _INCR_IMAGE_ORACLE,
)
def q_streaming_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `incremental_image_dedup_batch` (round 13):
    the documents stream's new slice probes the eagerly-checkpointed
    static corpus pHash table per micro-batch via foreachBatch, writing
    idempotent batch-id-versioned outputs (kill/replay-safe). Shares the
    batch oracle — the per-image verdict depends only on the static
    corpus, so any micro-batch split unions to the batch report."""
    from azure_medicine_data_engineering_spark.streaming.windows import (
        streaming_image_dedup_matches,
    )

    return streaming_image_dedup_matches(spark, sf_dir)


# ---------------------------------------------------------------------------
# Round 14: image-embedding SemDeDup — the semantic rung above pHash,
# completing the image ladder exact (fingerprint) -> perceptual (pHash) ->
# semantic (learned-tower embedding clusters).
# ---------------------------------------------------------------------------
from azure_medicine_data_engineering_spark.queries.text_dedup import (  # noqa: E402
    _COS_AB as _IC_COS,
    _kmeans_round_sql as _ikm,
)

#: round 15: SEM_BASE_SCALE x per-family base (media_id div
#: SEM_FAMILY_DIV) + the fp-derived noise — planted cluster structure so
#: keep-rates mean something (sources/webdataset.py:image_grid_embeddings)
_IMG_TOWER = (
    "list_transform(range(32), j -> CAST("
    "(CAST(('0x' || substr(md5('sem:' || CAST(doc_id // 16 AS VARCHAR)"
    " || ':' || j), 1, 8)) AS BIGINT) % 2001 - 1000) * 4"
    " + (CAST(('0x' || substr(md5(fpi || ':' || j), 1, 8)) AS BIGINT) % 2001 - 1000)"
    " + (CAST(('0x' || substr(md5('i:' || fpi || ':' || j), 1, 8)) AS BIGINT) % 101 - 50)"
    " AS DOUBLE))"
)


@register(
    "image_semantic_dedup_flags",
    f"""
    WITH m AS (SELECT doc_id, md5(text) AS fpi FROM documents),
    e AS (SELECT doc_id AS vec_id, {_IMG_TOWER} AS v FROM m),
    cent0 AS (
      SELECT vec_id % 8 AS cluster, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM e, (SELECT unnest(range(32)) AS i) t(i)
      GROUP BY 1, 2
    ),
    carr0 AS (SELECT cluster, list(c ORDER BY dim) AS centroid
              FROM cent0 GROUP BY cluster),
    {{r1}},
    {{r2}},
    near AS (
      SELECT y.vec_id AS hi,
             CAST(COUNT(*) AS BIGINT) AS n_near_lower
      FROM a2 x JOIN a2 y
        ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      WHERE ROUND(CAST({_IC_COS.format(a='x.v', b='y.v')} AS DOUBLE), 4) >= 0.55
      GROUP BY y.vec_id
    )
    SELECT a.vec_id AS media_id, a.cluster,
           COALESCE(n.n_near_lower, 0) AS n_near_lower,
           (n.hi IS NULL) AS keep
    FROM a2 a LEFT JOIN near n ON a.vec_id = n.hi
    """.format(
        r1=_ikm("e", "carr0", "a1", "cent1", "carr1", dim=32),
        r2=_ikm("e", "carr1", "a2", "cent2", "carr2", dim=32),
    ),
)
def q_image_semantic_dedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup on the IMAGE modality (round 14): per-sample image-tower
    embeddings recovered from the WDS samples' DECODED PIXELS
    (`sources/webdataset.py:image_grid_embeddings`), k=8 trained Lloyd
    clusters, within-cluster rounded cosine >= 0.55 marks a lower-id
    semantic near-neighbor, one representative survives — the semantic
    rung above exact-fingerprint and banded-pHash image dedup (Abbas et
    al. 2023 applied to images, where the original SemDeDup work targets
    LAION). The oracle replays the embedding md5 chain, the full Lloyd
    fit (shared `_kmeans_round_sql` fragments at dim=32), and every
    within-cluster pair. The pHash-distant-but-semantically-near ladder
    pin lives in tests/test_image_semdedup.py (semantic similarity is a
    property of the learned tower, not the pixels — exactly why this
    rung exists)."""
    from azure_medicine_data_engineering_spark.operators import dedup
    from azure_medicine_data_engineering_spark.session import ensure_parallelism
    from azure_medicine_data_engineering_spark.sources.webdataset import (
        attach_wds_image_caption_payload,
        image_grid_embeddings,
    )

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    media = attach_wds_image_caption_payload(docs, "doc_id", "text")
    emb = image_grid_embeddings(media)
    return dedup.semantic_dedup_flags(
        emb, k=8, iterations=2, threshold=0.55,
        id_col="media_id", vec_col="embedding",
    )
