"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard (BASELINE.json scale extensions).

Design: everything is hash-based column expressions (md5 → integer), JVM-side,
so signatures are bit-identical across engines and partitionings — no UDFs,
no RNG. At 100 TB:

- exact dedup = one shuffle on the 128-bit fingerprint;
- MinHash signatures are computed per-row (no shuffle), LSH banding turns the
  O(n²) pair search into a groupBy on (band, band_signature) — candidates are
  only verified inside buckets;
- SimHash gives a per-row 60-bit sketch; near-dup = small Hamming distance,
  searchable by banding the bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.repetition import bind_once
from azure_medicine_data_engineering_spark.operators.text import normalized_text, tokens

#: 60-bit hash from md5 hex (15 nibbles) — fits a signed 64-bit long and can
#: be reproduced in any engine with md5 + hex parsing.
def _hash60(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


#: 32-bit base hash for MinHash permutations (one md5 per shingle; the k
#: signature slots come from cheap universal-hash permutations of it).
def _hash32(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


_MERSENNE31 = 2147483647  # 2^31 - 1
#: fixed multiplier/offset pairs for (a·h + b) mod p permutations —
#: deterministic across engines, a < 2^31 so a·h < 2^63 never overflows.
_MINHASH_AB = [
    (1000000007, 12345), (998244353, 67891), (774712353, 24680), (452930477, 13579),
    (370248451, 97531), (611603069, 86420), (150094635, 11111), (506952355, 99991),
    (1860700189, 40423), (1203793451, 55511), (695432161, 80808), (1522605229, 31317),
    (913488131, 27271), (1751730773, 64646), (429496729, 50505), (1073741827, 73737),
]


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-token shingles of the normalized text; empty array when the document
    has fewer than ``n`` tokens.

    The token array is bound once (:func:`bind_once`): the previous direct
    form re-evaluated ``tokens(normalized_text(text))`` — two regex passes
    over the full document — per shingle position inside the transform
    lambda (the lambda-capture pitfall; optimization round 15)."""
    return bind_once(
        tokens(normalized_text(text)),
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def _explode_bands(bands: int, rows: int) -> Column:
    """``explode`` input for LSH banding with the signature column bound
    once: a captured ``col("sig")`` inside the transform lambda gets the
    full signature expression INLINED per band once the optimizer collapses
    the adjacent projections — k md5+permutation evaluations per band
    instead of per row (optimization round 15)."""
    return F.explode(
        bind_once(
            F.col("sig"),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice(s, b * rows + 1, rows).alias("bucket"),
                ),
            ),
        )
    )


def _permuted_min(hashes: Column, j: int):
    """min over shingle hashes of the j-th universal-hash permutation.
    NOTE: transform lambdas must be 1-arg (a 2-arg lambda would receive the
    element *index* as its second argument — not a closure default)."""
    a, b = _MINHASH_AB[j]
    return F.array_min(
        F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MERSENNE31))
    )


def minhash_signature(text: Column, k: int = 8, shingle_n: int = 3) -> Column:
    """k-element MinHash signature: one md5 per shingle (hash32), then k
    cheap (a·h + b) mod 2^31-1 permutations — the standard construction;
    8-16× fewer md5 evaluations than per-seed hashing. NULL signature slot
    when no shingles."""
    if k > len(_MINHASH_AB):
        raise ValueError(f"k up to {len(_MINHASH_AB)} supported")
    # bind the shingle-hash array once: each of the k _permuted_min slots
    # captures `hashes`, so the direct form re-evaluated the whole
    # shingle+md5 chain k times per row (optimization round 15)
    return bind_once(
        F.transform(word_shingles(text, shingle_n), _hash32),
        lambda h: F.array(*[_permuted_min(h, j) for j in range(k)]),
    )


def simhash60(text: Column) -> Column:
    """60-bit SimHash over tokens: bit b is set iff the sum of ±1 votes
    (token-hash bit b) is positive. Pure array aggregation — no shuffle."""
    hs = F.transform(tokens(normalized_text(text)), _hash60)
    # getbit/pow(2,b) instead of shift functions: Spark's shiftleft/shiftright
    # only accept literal ints for the shift amount, not Columns. 2^b is exact
    # in double for b <= 59, so the cast back to long is lossless.
    # Long fold state (repo convention after the gopher/token_stats fixes):
    # per-bit votes are bounded by tokens-per-doc, but all-long keeps every
    # F.aggregate seed on one rule instead of a per-site bound argument.
    votes = F.aggregate(
        hs,
        F.array(*[F.lit(0)] * 60).cast("array<bigint>"),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(59)),
                lambda b: F.when(F.getbit(h, b) == 1, 1).otherwise(-1),
            ),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(59)),
            lambda v, b: F.when(v > 0, F.pow(F.lit(2.0), b).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-dup groups by content fingerprint: (fingerprint, n_docs,
    representative) with representative = min id. One shuffle."""
    from azure_medicine_data_engineering_spark.operators.text import fingerprint

    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(id_col).alias("representative"),
        )
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content (min id wins) — the scale-safe
    exact dedup: shuffle on fingerprint, no sort."""
    from pyspark.sql.window import Window
    from azure_medicine_data_engineering_spark.operators.text import fingerprint

    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate pairs: band the k-signature into ``bands`` rows
    of k/bands values; docs sharing any band bucket are candidates.
    Plan: per-row signature (no shuffle) → explode bands (×bands) → shuffle
    on (band, signature-slice) → per-bucket self-pairing. Never O(n²)."""
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    rows = k // bands
    sig = minhash_signature(F.col(text_col), k, shingle_n)
    # hashing is CPU-bound per row: make sure a small scan doesn't serialize it
    df = ensure_parallelism(df)
    banded = df.select(F.col(id_col), sig.alias("sig")).select(
        F.col(id_col),
        _explode_bands(bands, rows).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col(f"l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    cache: bool = True,
    max_pairs_per_bucket: int | None = None,
) -> DataFrame:
    """End-to-end near-dup report: MinHash → LSH candidates → exact Jaccard.

    The shingle frame is computed ONCE and cached — banding and Jaccard
    verification both reuse it (recomputing shingles per join side triples
    the tokenization+md5 cost; at 100 TB the equivalent is materializing the
    signature table before the self-join).

    ``max_pairs_per_bucket`` (round 13, the SCALE.md-named mitigation for
    the C(k,2) mega-bucket blowup): when set, each (band, bucket) emits at
    most that many candidate pairs, selected DETERMINISTICALLY in
    lexicographic (id_a, id_b) order — i.e. the pairs involving the
    bucket's lowest ids come first, so truncation keeps the star around
    the canonical representative. The rule is closed-form: with members
    ranked 1..n by id, the pairs preceding left-rank r number
    S(r-1) = (r-1)(2n-r)/2, and pair (r_l, r_r) is emitted iff
    S(r_l-1) + (r_r - r_l) <= cap. The plan stays bounded because the
    LEFT side of the bucket self-join is pre-filtered to ranks with
    S(r-1) < cap — in a mega-bucket that is ~cap/n + 1 members, so the
    per-bucket join work is O(cap + n), never C(n,2). Small buckets
    (C(n,2) <= cap) are emitted in full — the cap is a no-op on healthy
    buckets and only truncates the pathological ones."""
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    rows = k // bands
    # Materialize the md5 hash array IN the persisted stage frame: each of
    # the k signature slots references `hashes`, and an expression-level
    # transform(shingles, md5…) would re-run the md5 pass k times per row
    # (CLAUDE.md nested-array-expression rule; measured 212 s vs 27 s on
    # the 100x replica for the representatives path before this staging).
    sh = ensure_parallelism(df).select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("shingles")
    ).select(
        F.col(id_col),
        "shingles",
        F.transform(F.col("shingles"), _hash32).alias("hashes"),
    )
    if cache:
        sh = sh.persist()
    sig = sh.select(
        F.col(id_col),
        # bind once: with cache=False the projections collapse and the
        # hash chain would re-inline per permutation slot (round 15)
        bind_once(
            F.col("hashes"),
            lambda h: F.array(*[_permuted_min(h, j) for j in range(k)]),
        ).alias("sig"),
    )
    banded = sig.select(
        F.col(id_col),
        _explode_bands(bands, rows).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    if max_pairs_per_bucket is None:
        pairs = (
            banded.alias("l")
            .join(
                banded.alias("r"),
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            )
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
            )
            .distinct()
        )
    else:
        from pyspark.sql import Window

        cap = int(max_pairs_per_bucket)
        wo = Window.partitionBy("band", "bucket").orderBy(id_col)
        wc = Window.partitionBy("band", "bucket")
        # O(n log n) per bucket — vs C(n,2) pair emission; positive
        # operands so `div` matches DuckDB `//`, and (r-1)(2n-r) is
        # always even so the division is exact.
        mr = banded.select(
            F.col(id_col),
            "band",
            "bucket",
            F.row_number().over(wo).alias("r"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        lhs = mr.where(F.expr(f"(r - 1) * (2 * n - r) div 2 < {cap}"))
        pairs = (
            lhs.alias("l")
            .join(
                mr.alias("r"),
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.r") < F.col("r.r")),
            )
            .where(
                F.expr(
                    f"(l.r - 1) * (2 * l.n - l.r) div 2 + (r.r - l.r) <= {cap}"
                )
            )
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
            )
            .distinct()
        )
    dsh = sh.select(F.col(id_col), F.array_distinct("shingles").alias("dsh"))
    return (
        pairs.join(dsh.alias("a"), pairs.id_a == F.col(f"a.{id_col}"))
        .join(dsh.alias("b"), pairs.id_b == F.col(f"b.{id_col}"))
        .select(
            "id_a",
            "id_b",
            F.round(
                (
                    F.size(F.array_intersect("a.dsh", "b.dsh"))
                    / F.nullif(F.size(F.array_union("a.dsh", "b.dsh")), F.lit(0))
                ).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )


def lsh_bucket_representatives(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Representatives-only LSH output (round 13): per document, the
    minimum id over every (band, bucket) the document lands in —
    ``(doc_id, rep_id, is_representative)`` — with ZERO pair emission.
    This is the one-hop min-label step of the connected-components
    resolution (`dedup_cluster_assignment` iterates it to fixpoint); as a
    standalone mode it is the bounded first pass production pipelines run
    when the pair volume itself is the bottleneck: cost is one window min
    per bucket + one groupBy per doc, linear in rows x bands regardless
    of bucket skew. Docs sharing any band bucket get the same rep after
    enough hops; one hop already collapses every star-shaped family."""
    from pyspark.sql import Window

    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    rows = k // bands
    # Stage-materialize the md5 hash array before fanning out to the k
    # signature slots — the inline expression form re-runs shingling+md5
    # once PER SLOT (8x; measured 212 s vs 27 s at the 100x replica).
    hh = ensure_parallelism(df).select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("shingles")
    ).select(
        F.col(id_col), F.transform(F.col("shingles"), _hash32).alias("hashes")
    ).persist()
    banded = (
        hh.select(
            F.col(id_col),
            F.array(*[_permuted_min(F.col("hashes"), j) for j in range(k)]).alias(
                "sig"
            ),
        )
        .select(
            F.col(id_col),
            _explode_bands(bands, rows).alias("bb"),
        )
        .select(id_col, "bb.band", "bb.bucket")
    )
    wmin = Window.partitionBy("band", "bucket")
    out = (
        banded.withColumn("mn", F.min(id_col).over(wmin))
        .groupBy(id_col)
        .agg(F.min("mn").alias("rep_id"))
        .select(
            F.col(id_col),
            "rep_id",
            (F.col(id_col) == F.col("rep_id")).alias("is_representative"),
        )
    )
    out._stage_caches = [hh]
    return out


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    cache: bool = True,
) -> DataFrame:
    """SimHash near-duplicate pairs: 60-bit sketches banded into ``bands``
    equal bit-chunks; docs sharing any chunk are candidates, verified by
    exact Hamming distance (``bit_count(xor)``).

    Recall is EXACT (not approximate) when ``max_hamming < bands``: by
    pigeonhole, <= max_hamming differing bits can touch at most max_hamming
    chunks, so at least one chunk is identical and the banded join finds
    every qualifying pair. The verification filter removes band collisions
    above the threshold, so the output equals the brute-force O(n^2) answer
    while the plan is one sketch pass + a shuffle on (band, chunk) with
    bucket-local pairing — the same scale shape as MinHash-LSH
    (lsh_candidate_pairs above); re-expresses the near-dup intent of the
    reference's distinct-based dedup (fl_aud.R:21 unique()) at corpus scale.

    The sketch frame is computed once and persisted — both self-join sides
    reuse it (sketching is the expensive per-row md5 work; at 100 TB the
    equivalent is materializing the sketch table before the self-join).
    """
    if max_hamming >= bands:
        raise ValueError(
            f"exact recall needs max_hamming < bands (got {max_hamming} >= {bands})"
        )
    if 60 % bands:
        raise ValueError(f"bands must divide 60 (got {bands})")
    width = 60 // bands
    mask = (1 << width) - 1
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    sk = ensure_parallelism(df).select(
        F.col(id_col), simhash60(F.col(text_col)).alias("simhash")
    )
    if cache:
        sk = sk.persist()
    banded = sk.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bc"),
    ).select(id_col, "simhash", "bc.band", "bc.chunk")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def typo_pairs(df: DataFrame, token_col: str = "token") -> DataFrame:
    """Edit-distance-1 token pairs via symmetric-delete (SymSpell/FastSS)
    blocking: each token emits itself plus every one-character deletion as
    candidate keys; any two tokens at Levenshtein distance ≤ 1 provably
    share at least one key (delete the substituted/inserted character), so
    recall is EXACT while the pair search stays bucket-local — one shuffle
    on the deletion key, never O(n²) over the vocabulary. Candidates are
    verified with the built-in JVM ``levenshtein``.

    The vocabulary-cleaning counterpart of the reference's categorical
    normalization (fixStringsNamesInsides, UTILS/utils.scala:104-118) at
    corpus scale: typo variants of frequent tokens surface as distance-1
    pairs."""
    toks = df.select(F.col(token_col).alias("tok")).distinct()
    keys = toks.select(
        "tok",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("tok")),
                    F.expr(
                        "transform(sequence(1, length(tok)), "
                        "i -> concat(substring(tok, 1, i - 1), substring(tok, i + 1, length(tok))))"
                    ),
                )
            )
        ).alias("k"),
    )
    left = keys.alias("l")
    right = keys.alias("r")
    return (
        left.join(
            right,
            (F.col("l.k") == F.col("r.k")) & (F.col("l.tok") < F.col("r.tok")),
        )
        .select(F.col("l.tok").alias("tok_a"), F.col("r.tok").alias("tok_b"))
        .distinct()
        .withColumn("dist", F.levenshtein("tok_a", "tok_b").cast("int"))
        .where(F.col("dist") <= 1)
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity."""
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    sh = df.select(
        F.col(id_col), F.array_distinct(word_shingles(F.col(text_col), shingle_n)).alias("sh")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        pairs.join(a, pairs.id_a == F.col(f"a.{id_col}"))
        .join(b, pairs.id_b == F.col(f"b.{id_col}"))
        .select(
            "id_a",
            "id_b",
            F.round(
                (
                    F.size(F.array_intersect("a.sh", "b.sh"))
                    / F.nullif(F.size(F.array_union("a.sh", "b.sh")), F.lit(0))
                ).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )


def duplicate_window_spans(
    df: DataFrame,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache: bool = True,
) -> DataFrame:
    """Cross-document duplicated token-window signal — the bounded-window
    form of exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better": duplicated ≥N-token substrings are
    memorization hot-spots). Every ``w``-token sliding window is hashed; a
    window hash occurring in ≥ 2 DISTINCT documents marks each of its
    occurrences as duplicated. Returns per document:
    ``(id, n_windows, n_dup_windows, dup_frac)``.

    Scale: windows explode map-only (×~w string mass, hashed immediately to
    a 128-bit key); ONE shuffle keyed on window hash computes distinct-doc
    counts; duplicated hashes flow back via a hash-key join against the
    persisted window frame (2 consumers — CLAUDE.md persist rule). Common
    boilerplate windows create hot hash keys, but their reduce state is one
    counter per key — AQE handles the join-side skew."""
    from azure_medicine_data_engineering_spark.operators.repetition import word_ngrams
    from azure_medicine_data_engineering_spark.operators.text import tokens
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    wins = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(word_ngrams(tokens(F.col(text_col)), w)).alias("gram"),
        )
        .select(F.col(id_col), F.md5("gram").alias("h"))
    )
    if cache:
        # 2 consumers (distinct-doc counts + per-doc join); the caller owns
        # the lifecycle for long-lived sessions (same convention as
        # minhash_dedup_pairs) — pass cache=False to manage it elsewhere
        wins = wins.persist()
    dup_h = (
        wins.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    per_doc = wins.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_windows")
    )
    dup_per_doc = (
        wins.join(dup_h, "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_windows"))
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .join(dup_per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.round(
                (
                    F.coalesce("n_dup_windows", F.lit(0))
                    / F.nullif(F.coalesce("n_windows", F.lit(0)), F.lit(0))
                ).cast("double"),
                4,
            ).alias("dup_frac"),
        )
    )


def duplicate_span_ranges(
    df: DataFrame,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache: bool = True,
) -> DataFrame:
    """MAXIMAL duplicated-span cut ranges — the Lee et al. 2022 output
    :func:`duplicate_window_spans` stops short of: that operator flags
    fixed-width duplicated windows; this one merges adjacent/overlapping
    flagged windows per document into maximal token ranges (the byte
    ranges ExactSubstr actually cuts). Islands-and-gaps over window
    ordinals: window ordinal ``o`` covers tokens ``[o, o+w)``; a flagged
    ordinal opens a new island when it starts past the previous flagged
    ordinal's coverage (``o > prev + w``), else it extends the island.
    Returns one row per maximal span:
    ``(id, span_start, span_end, span_tokens, n_windows)`` — token
    indices 0-based, end exclusive.

    Scale: same window-hash shuffle as :func:`duplicate_window_spans`;
    the island windows (`lag` + running sum) key on the DOCUMENT, so
    there is no single-partition exchange anywhere."""
    from pyspark.sql.window import Window

    from azure_medicine_data_engineering_spark.operators.repetition import word_ngrams
    from azure_medicine_data_engineering_spark.operators.text import tokens
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    wins = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.posexplode(word_ngrams(tokens(F.col(text_col)), w)).alias(
                "ord", "gram"
            ),
        )
        .select(F.col(id_col), F.col("ord").cast("long").alias("ord"),
                F.md5("gram").alias("h"))
    )
    if cache:
        wins = wins.persist()  # 2 consumers: distinct-doc counts + flag join
    dup_h = (
        wins.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    flagged = wins.join(dup_h, "h").select(id_col, "ord")
    w_doc = Window.partitionBy(id_col).orderBy("ord")
    prev = F.lag("ord").over(w_doc)
    islands = flagged.select(
        F.col(id_col),
        "ord",
        F.when(prev.isNull() | (F.col("ord") > prev + w), 1)
        .otherwise(0)
        .alias("ni"),
    ).select(
        F.col(id_col),
        "ord",
        F.sum("ni")
        .over(w_doc.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    out = (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("ord").cast("long").alias("span_start"),
            (F.max("ord") + w).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start"))
            .cast("long")
            .alias("span_tokens"),
            "n_windows",
        )
    )
    out._stage_caches = [wins] if cache else []
    return out


def incremental_dedup_flags(
    new: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    cache: bool = True,
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus — the incremental form
    every periodically-refreshed training corpus needs (the batch queries
    dedup a closed corpus; ingestion dedups against what is already kept).

    Per new document: ``exact_dup`` (content fingerprint already present in
    the corpus) and ``near_dup`` (shares an LSH band bucket with a corpus
    doc AND verifies at Jaccard ≥ ``threshold``), plus the near-match count.

    Scale: the corpus side is never self-joined — candidates come from a
    (band, bucket)-keyed join of the small new-batch banding against the
    corpus banding (at 100 TB the corpus banding/fingerprints are
    precomputed tables maintained across runs; only the new batch hashes
    per ingest). Shingle frames are persisted per side — banding and
    Jaccard verification both read them. The CALLER owns the cache
    lifecycle (repo cache-flag convention): the advertised use is repeated
    per-ingest calls in a long-lived session, where the corpus-sized
    shingle cache would otherwise leak per call — pass ``cache=False``
    there, or unpersist via the returned frame's ``_dedup_caches``."""
    from azure_medicine_data_engineering_spark.operators.text import fingerprint
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    rows = k // bands

    def shingled(df: DataFrame) -> DataFrame:
        sh = ensure_parallelism(df).select(
            F.col(id_col),
            word_shingles(F.col(text_col), shingle_n).alias("shingles"),
        )
        return sh.persist() if cache else sh

    def banded(sh: DataFrame) -> DataFrame:
        # bind once: the md5 transform over shingles would re-evaluate
        # per permutation slot when captured directly (round 15)
        sig = sh.select(
            F.col(id_col),
            bind_once(
                F.transform(F.col("shingles"), _hash32),
                lambda h: F.array(*[_permuted_min(h, j) for j in range(k)]),
            ).alias("sig"),
        )
        return sig.select(
            F.col(id_col),
            _explode_bands(bands, rows).alias("bb"),
        ).select(id_col, "bb.band", "bb.bucket")

    sh_new, sh_corp = shingled(new), shingled(corpus)
    cand = (
        banded(sh_new)
        .alias("n")
        .join(
            banded(sh_corp).alias("c"),
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.bucket") == F.col("c.bucket")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"c.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )
    dsh = lambda sh: sh.select(  # noqa: E731
        F.col(id_col), F.array_distinct("shingles").alias("dsh")
    )
    near = (
        cand.join(dsh(sh_new).alias("a"), cand.new_id == F.col(f"a.{id_col}"))
        .join(dsh(sh_corp).alias("b"), cand.corpus_id == F.col(f"b.{id_col}"))
        .select(
            "new_id",
            F.round(
                (
                    F.size(F.array_intersect("a.dsh", "b.dsh"))
                    / F.nullif(F.size(F.array_union("a.dsh", "b.dsh")), F.lit(0))
                ).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .groupBy("new_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_near"))
    )
    corp_fp = (
        corpus.select(fingerprint(F.col(text_col)).alias("fp"))
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    out = (
        new.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .join(corp_fp, "fp", "left")
        .join(near, F.col(id_col) == F.col("new_id"), "left")
        .select(
            id_col,
            F.coalesce("_hit", F.lit(False)).alias("exact_dup"),
            (F.coalesce("n_near", F.lit(0)) > 0).alias("near_dup"),
            F.coalesce("n_near", F.lit(0)).cast("long").alias("n_near"),
        )
    )
    out._dedup_caches = [sh_new, sh_corp] if cache else []
    return out


def semantic_dedup_flags(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """SemDeDup — semantic (embedding-space) near-duplicate pruning
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication"): cluster the corpus embeddings with
    k-means, then compare pairs ONLY within each cluster; items whose
    cosine similarity to another cluster member exceeds ``threshold`` are
    duplicates, one representative survives.

    Determinism variant (documented deviation from the paper's
    keep-farthest-from-centroid): an item is DROPPED iff some LOWER-id
    member of its cluster is within the threshold — the same one-pass
    lower-id rule the MinHash/SimHash pair semantics use, reproducible on
    any partitioning/engine. Cosines are rounded before the comparison so
    both engines branch identically.

    Returns ``(id, cluster, n_near_lower, keep)`` for every input row.

    Scale: the paper's design point — pairwise work is n²/k per cluster,
    recovered by making k proportional to corpus size (50k clusters at
    web scale); the join is cluster-keyed (one shuffle), centroids
    broadcast, never an all-pairs product. The k-means fit is
    :func:`azure_medicine_data_engineering_spark.operators.similarity.kmeans_fit`
    (bit-reproducible Lloyd rounds)."""
    from azure_medicine_data_engineering_spark.operators import similarity

    _, assigned = similarity.kmeans_fit(
        df, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    )
    # assigned is persisted by kmeans_fit — both self-join sides and the
    # final left join read it. Alias + qualify: same-lineage self-join.
    #
    # Optimization round 16 (guide §2.5 / r15 VERDICT #9): SALT the
    # within-cluster self-join. With few clusters (k=8 here) the
    # cluster-keyed join runs on <= k tasks regardless of core count and
    # one task holds a whole cluster's candidate mass (the 8-core bench
    # spilled exactly there). Salting by the HI side's deterministic
    # bucket splits each cluster's pair space into S slices — the LO side
    # is replicated S ways so every (lo, hi) pair still meets EXACTLY
    # once (hi's bucket is a function of hi alone), so the result set is
    # identical; per-task build state shrinks S-fold and parallelism
    # rises to k*S. S adapts to the session (paper-scale k already gives
    # enough keys -> S collapses to 1; perf-only, never semantic).
    sess = df.sparkSession
    salt_n = max(1, (sess.sparkContext.defaultParallelism * 2) // max(k, 1))
    x, y = assigned.alias("_sx"), assigned.alias("_sy")
    cos = F.round(
        similarity.cosine(
            similarity.as_double_array(F.col(f"_sx.{vec_col}")),
            similarity.as_double_array(F.col(f"_sy.{vec_col}")),
        ).cast("double"),
        round_digits,
    )
    x_salted = x.withColumn(
        "_salt_x",
        F.explode(F.array(*[F.lit(i) for i in range(salt_n)])),
    )
    salt_y = F.pmod(F.xxhash64(F.col(f"_sy.{id_col}")), F.lit(salt_n)).cast(
        "int"
    )
    near = (
        x_salted.join(
            y,
            (F.col("_sx.cluster") == F.col("_sy.cluster"))
            & (F.col("_salt_x") == salt_y)
            & (F.col(f"_sx.{id_col}") < F.col(f"_sy.{id_col}")),
        )
        .select(F.col(f"_sy.{id_col}").alias("_hi"), cos.alias("_cos"))
        .where(F.col("_cos") >= threshold)
        .groupBy("_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_near_lower"))
    )
    return (
        assigned.join(near, F.col(id_col) == F.col("_hi"), "left")
        .select(
            id_col,
            "cluster",
            F.coalesce("n_near_lower", F.lit(0)).cast("long").alias("n_near_lower"),
            (F.coalesce("n_near_lower", F.lit(0)) == 0).alias("keep"),
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    key: Column | None = None,
    cache: bool = True,
) -> DataFrame:
    """Cross-source duplicate overlap — the dataset-health matrix a corpus
    curator reads before mixing sources (a high-overlap pair means one
    source republishes the other; dedup order and mixture weights both
    depend on knowing that). One sparse row per unordered source pair that
    shares at least one exact content fingerprint:
    ``(source_a, source_b, n_shared, n_a, n_b, jaccard)`` with Jaccard on
    the distinct-content sets via integer micro-unit division.

    Scale: the (source, fp) DISTINCT frame is one shuffle of the corpus
    and is persisted for its three consumers (pair join both sides +
    per-source totals; caller releases via ``out._stage_caches`` when
    ``cache``). The pair join is keyed on fp, so work is proportional to
    duplicated content only — sources-squared never materializes beyond
    the observed-overlap rows; per-source totals are a ~|sources|-row
    broadcast.

    ``key`` overrides the content key (default: the exact
    ``text.fingerprint``) — e.g. an opening-prefix fingerprint measures
    shared boilerplate rather than verbatim duplication."""
    from azure_medicine_data_engineering_spark.operators.text import fingerprint

    if key is None:
        key = fingerprint(F.col(text_col))
    fps = df.select(F.col(group_col).alias("src"), key.alias("fp")).distinct()
    if cache:
        fps = fps.persist()
    totals = fps.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n_set"))
    pairs = (
        fps.alias("a")
        .join(fps.alias("b"), (F.col("a.fp") == F.col("b.fp")) & (F.col("a.src") < F.col("b.src")))
        .groupBy(
            F.col("a.src").alias("source_a"), F.col("b.src").alias("source_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    out = (
        pairs.join(
            F.broadcast(totals.select(F.col("src").alias("source_a"), F.col("n_set").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(totals.select(F.col("src").alias("source_b"), F.col("n_set").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            (F.expr("n_shared * 1000000 div (n_a + n_b - n_shared)") / 1e6).alias(
                "jaccard"
            ),
        )
    )
    out._stage_caches = [fps] if cache else []
    return out


def edit_distance_near_pairs(
    df: DataFrame,
    max_ratio_micro: int = 300_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character-level near-duplicate verification: LSH candidate pairs
    re-checked by EXACT Levenshtein distance — the strictest of the repo's
    pair-verify ladders (Jaccard sees bag overlap, SimHash sees bit drift;
    edit distance sees the actual keystrokes between two versions of a
    document, the signal a dedup audit quotes).

    Keeps pairs whose normalized distance ``lev / max(len_a, len_b)`` is at
    most ``max_ratio_micro`` micro-units, compared in INTEGER cross-product
    form (``lev · 1e6 ≤ ratio · maxlen``) — no division, engine-exact.
    Levenshtein is built into both engines' SQL cores (JVM here, native in
    the DuckDB oracle), so the verify stays out of Python.

    Scale: candidate generation is the banded-LSH shuffle (never all
    pairs); the O(len²) Levenshtein DP runs ONLY on surviving candidate
    pairs — the same cost discipline as the Jaccard verify."""
    cand = lsh_candidate_pairs(df, text_col, id_col)
    texts = df.select(F.col(id_col), F.col(text_col))
    a = texts.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    b = texts.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    lev = F.levenshtein(F.col("_ta"), F.col("_tb")).cast("long")
    maxlen = F.greatest(F.length("_ta"), F.length("_tb")).cast("long")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            lev.alias("edit_distance"),
            maxlen.alias("max_len"),
            (F.expr("edit_distance * 1000000 div max_len") / 1e6).alias(
                "edit_ratio"
            ),
        )
        .where(
            F.col("edit_distance") * 1_000_000
            <= F.lit(int(max_ratio_micro)) * F.col("max_len")
        )
    )


def containment_top_pairs(
    df: DataFrame,
    top_k: int = 50,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Jaccard CONTAINMENT pairs (Broder's asymmetric resemblance twin):
    ``C(A→B) = |A∩B| / |A|`` catches what symmetric Jaccard dilutes —
    a short document QUOTED inside a long one scores containment ≈ 1
    with tiny Jaccard. Distinct shingle sets share through one
    shingle-keyed join (posting-list bounded — at 100 TB run it behind
    the LSH candidate prefilter like the edit-distance rung); emits the
    ``top_k`` pairs by max-directional containment (micro grid,
    deterministic id tie-break). Returns ``(id_a, id_b, n_shared, n_a,
    n_b, containment_a, containment_b)``."""
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s"),
        )
        .distinct()
        .persist()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n_set"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    joined = (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_set", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_set", "n_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            "n_a",
            "n_b",
            (F.expr("n_shared * 1000000 div n_a") / 1e6).alias("containment_a"),
            (F.expr("n_shared * 1000000 div n_b") / 1e6).alias("containment_b"),
        )
    )
    best = F.greatest(F.col("containment_a"), F.col("containment_b"))
    return (
        joined.orderBy(best.desc(), "id_a", "id_b")
        .limit(top_k)
        .select("id_a", "id_b", "n_shared", "n_a", "n_b",
                "containment_a", "containment_b")
    )
