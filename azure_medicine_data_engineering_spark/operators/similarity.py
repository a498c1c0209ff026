"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — exact, O(n) per query, fine for
broadcast-sized query sets. Scale path: sign-grid LSH bucketing — a
deterministic locality hash on the first ``b`` component signs turns the
all-pairs search into a per-bucket search (recall is approximate by design).

All arithmetic is JVM-side higher-order functions (zip_with/aggregate);
no UDFs, no RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def as_double_array(c: Column) -> Column:
    """float32 → float64 promotion so both engines compute in double."""
    return F.transform(c, lambda x: x.cast("double"))


def knn_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries`` (query_id, embedding) is broadcast; the corpus is scanned
    once; the top-k selection is TWO-STAGE: a first rank window partitioned
    by (query, salt) — ``salt = neighbor_id % 64`` — keeps k candidates per
    salt, so the corpus-sized scored stream shuffles across
    queries × 64 reducers instead of funneling every scored row into
    n_queries hot partitions (with a 5-query panel that would be 5 reducers
    for the whole corpus); the second window ranks the surviving
    queries × 64 × k rows only. The global top-k is a subset of the
    per-salt top-k's union, so the result is identical to the one-window
    form, tie-breaks included.

    ``exclude_self`` assumes query ids live in the corpus id space (queries
    drawn from the corpus, as ivf_knn_topk guarantees). Pass False for
    external query sets whose ids could collide with corpus ids — otherwise
    a coincidental id match would silently drop a valid neighbor."""
    from pyspark.sql.window import Window

    q = F.broadcast(queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec")))
    joined = df.select(F.col(id_col), F.col(vec_col)).crossJoin(q)
    if exclude_self:
        joined = joined.where(F.col(id_col) != F.col(query_id_col))
    sim = (
        joined.select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine(as_double_array(F.col(vec_col)), as_double_array(F.col("_qvec"))).cast(
                    "double"
                ),
                4,
            ).alias("cos_sim"),
        )
    )
    w1 = Window.partitionBy(query_id_col, "_salt").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    cand = (
        sim.withColumn("_salt", F.col("neighbor_id") % 64)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
        .select(query_id_col, "neighbor_id", "cos_sim", "rnk")
    )


def ivf_centroids(
    df: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Deterministic IVF coarse quantizer: centroid j = element-wise mean of
    vectors with ``id % n_clusters == j`` (id-seeded partition — one k-means
    "assignment-free" step; swap in trained centroids for production).
    Components are rounded so both engines assign from identical doubles.

    Plan: posexplode → groupBy (cluster, dim) partial+final avg → rebuild
    ordered arrays. Centroid table is tiny (k rows) — broadcast downstream."""
    exploded = df.select(
        (F.col(id_col) % n_clusters).alias("cluster"),
        F.posexplode(as_double_array(F.col(vec_col))).alias("dim", "v"),
    )
    return (
        exploded.groupBy("cluster", "dim")
        .agg(F.round(F.avg("v"), round_digits).alias("c"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
            ).alias("centroid")
        )
    )


def _mean_centroids(
    assigned: DataFrame, vec_col: str, round_digits: int
) -> DataFrame:
    """Element-wise means per assigned cluster (same explode→avg→rebuild
    shape as :func:`ivf_centroids`); clusters that lose every member
    simply vanish from the codebook on both engines."""
    exploded = assigned.select(
        "cluster", F.posexplode(as_double_array(F.col(vec_col))).alias("dim", "v")
    )
    return (
        exploded.groupBy("cluster", "dim")
        .agg(F.round(F.avg("v"), round_digits).alias("c"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
            ).alias("centroid")
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means over an embedding column: deterministic id-seeded
    init (:func:`ivf_centroids`), then ``iterations`` rounds of
    assign-to-nearest (cosine, rounded, tie-break on cluster id) +
    recompute means. Returns (centroids, final_assignment).

    This is the trained-quantizer step :func:`ivf_centroids` stubs out:
    at 100 TB each round is one corpus pass (broadcast k×d centroids, no
    shuffle for scoring) plus one (cluster, dim) aggregation; rounded
    components keep every round bit-reproducible cross-engine, and a
    FIXED iteration count keeps the lineage a finite DAG (persist the
    assignment between rounds at depth)."""
    df = df.persist()  # scanned once per round (init + every assignment)
    cents = ivf_centroids(df, k, id_col, vec_col, round_digits)
    assigned = None
    for _ in range(iterations):
        assigned = ivf_assign(df, cents, id_col, vec_col).persist()
        cents = _mean_centroids(assigned, vec_col, round_digits)
    return cents, assigned


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (tie-break on the
    lower cluster id). The k centroids collapse to ONE broadcast array row
    and the argmax is a fold over that array — a pure map pass. (The naive
    shape — crossJoin to corpus×k rows + a row_number window on ``id_col``
    — re-shuffles the whole corpus once per Lloyd round; this one never
    shuffles at all.) Scoring matches the window version bit-for-bit: the
    same rounded-cosine IEEE expression, same lower-cluster tie-break,
    null/zero-norm sims pinned to -9 so they lose to every real score and
    fall to the lowest cluster id."""
    carr = centroids.agg(
        F.collect_list(
            F.struct(
                F.col("cluster").cast("long").alias("cl"),
                F.col("centroid"),
                norm(F.col("centroid")).alias("cnorm"),
            )
        ).alias("_cents")
    )
    vec_d = as_double_array(F.col(vec_col))
    cand = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.coalesce(
                F.round(
                    (dot(F.col("_vd"), c["centroid"])
                     / F.nullif(F.col("_vn") * c["cnorm"], F.lit(0.0))).cast("double"),
                    6,
                ),
                F.lit(-9.0),
            ).alias("s"),
            c["cl"].alias("cl"),
        ),
    )
    best = F.aggregate(
        cand,
        F.struct(
            F.lit(-99.0).alias("s"), F.lit(2147483647).cast("long").alias("cl")
        ),
        lambda acc, x: F.when(
            (x["s"] > acc["s"]) | ((x["s"] == acc["s"]) & (x["cl"] < acc["cl"])), x
        ).otherwise(acc),
    )
    return (
        df.select(F.col(id_col), F.col(vec_col), vec_d.alias("_vd"))
        .withColumn("_vn", norm(F.col("_vd")))
        .crossJoin(F.broadcast(carr))
        .select(id_col, vec_col, best["cl"].alias("cluster"))
    )


def ivf_knn_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed ANN: each query searches its ``nprobe`` nearest coarse
    clusters (the standard IVF recall knob — nprobe=1 is fastest, nprobe=k
    degenerates to exact search). Recall is approximate by design; at scale
    the corpus is pre-partitioned by cluster so each query touches
    nprobe/n_clusters of the data.

    The assigned frame (corpus × nearest cluster) is persisted: both the
    query-side filter (nprobe=1) and the corpus-side join read it, and
    without the persist Catalyst re-derives the whole centroid + assignment
    lineage (posexplode → 2×groupBy → window) once per consumer — the same
    materialize-before-self-join rule as the MinHash shingle cache
    (dedup.minhash_lsh_near_dupes). At 100 TB the equivalent is writing the
    assignment table before fan-out.

    ``centroids`` overrides the default id-mod coarse quantizer with a
    trained codebook (``(cluster, centroid)``, e.g. :func:`kmeans_fit`
    output) — trained cells follow the data distribution, so nprobe=1
    recall is what the knob promises instead of a random slice."""
    from pyspark.sql.window import Window

    # persist the k-row centroid table: its lineage is a full-corpus
    # posexplode aggregation, and with nprobe > 1 both the corpus-assign and
    # the query-probe sides consume it
    if centroids is None:
        centroids = ivf_centroids(df, n_clusters, id_col, vec_col)
    cents = centroids.persist()
    assigned = ivf_assign(df, cents, id_col, vec_col).persist()
    if nprobe <= 1:
        queries = assigned.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            F.col("cluster").alias("_qcluster"),
        )
    else:
        # score each query vector against every centroid, keep top-nprobe;
        # one probe row per (query, cluster) — the corpus join below then
        # pulls candidates from all probed clusters
        scored_q = (
            df.where(F.col(id_col).isin(query_ids))
            .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
            .crossJoin(F.broadcast(cents))
            .select(
                "query_id",
                "_qvec",
                "cluster",
                F.round(
                    cosine(as_double_array(F.col("_qvec")), F.col("centroid")).cast(
                        "double"
                    ),
                    6,
                ).alias("_psim"),
            )
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("_psim").desc(), F.col("cluster")
        )
        queries = (
            scored_q.withColumn("_prn", F.row_number().over(wq))
            .where(F.col("_prn") <= nprobe)
            .select("query_id", "_qvec", F.col("cluster").alias("_qcluster"))
        )
    sim = (
        assigned.join(
            F.broadcast(queries),
            (F.col("cluster") == F.col("_qcluster"))
            & (F.col(id_col) != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine(as_double_array(F.col(vec_col)), as_double_array(F.col("_qvec"))).cast(
                    "double"
                ),
                4,
            ).alias("cos_sim"),
        )
    )
    # two-stage top-k, same device as knn_topk: per-(query, salt) candidate
    # rank first so probed-cluster-sized candidate streams never funnel into
    # n_queries reducers; the final rank sees queries x 64 x k rows only
    w1 = Window.partitionBy("query_id", "_salt").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    cand = (
        sim.withColumn("_salt", F.col("neighbor_id") % 64)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def sign_bucket(vec: Column, bits: int = 12) -> Column:
    """Deterministic LSH bucket: integer from the signs of the first ``bits``
    components (component i contributes 2^i when positive)."""
    # pow(2,i) instead of shiftleft: Spark's shift functions only accept
    # literal ints for the amount; 2^i is exact in double for i <= 59.
    return F.aggregate(
        F.zip_with(
            F.slice(vec, 1, bits),
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda x, i: F.when(x > 0, F.pow(F.lit(2.0), i).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def bucketed_near_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs via sign-grid LSH: pairs are only
    compared inside a bucket (shuffle on bucket key, never O(n²) global)."""
    with_bucket = df.select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), bits).alias("bucket")
    )
    a = with_bucket.alias("a")
    b = with_bucket.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                cosine(
                    as_double_array(F.col(f"a.{vec_col}")),
                    as_double_array(F.col(f"b.{vec_col}")),
                ).cast("double"),
                4,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") > threshold)
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as an in-order fold (both engines sum the
    per-dimension squares left-to-right, so rounded values agree)."""
    d = F.zip_with(a, b, lambda x, y: x - y)
    return dot(d, d)


def pq_train_codes(
    df: DataFrame,
    m: int = 8,
    dsub: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    cache: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Product quantization: split each vector into ``m`` subspaces of
    ``dsub`` dims, quantize each subspace against ``ksub`` sub-centroids
    (deterministic id-seeded means, same convention as :func:`ivf_centroids`;
    swap in per-subspace Lloyd rounds for production), and encode every
    vector as its per-subspace nearest-centroid ids.

    Returns ``(codebook (s, cid, centroid), codes (id, s, code), subvecs)``
    — ``subvecs`` is persisted by default (centroid training and encoding
    both read it; without the persist Catalyst re-derives the explode per
    consumer). The CALLER owns the cache lifecycle: unpersist ``subvecs``
    after materializing downstream results, or pass ``cache=False`` in a
    long-lived session (same convention as the LM scorers).

    At 100 TB this is the memory-scaling ANN path: the corpus compresses
    from m*dsub floats to m single-byte codes per row (64x here), the
    codebook is m*ksub rows (broadcast), and encoding is one scan."""
    v = df.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("_v"))
    sub = (
        v.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.struct(
                        s.cast("int").alias("s"),
                        F.slice(F.col("_v"), s * dsub + 1, dsub).alias("sv"),
                    ),
                )
            ).alias("t"),
        )
        .select(id_col, "t.s", "t.sv")
    )
    if cache:
        sub = sub.persist()
    cdim = (
        sub.select((F.col(id_col) % ksub).alias("cid"), "s", F.posexplode("sv").alias("dim", "val"))
        .groupBy("s", "cid", "dim")
        .agg(F.round(F.avg("val"), round_digits).alias("c"))
    )
    codebook = cdim.groupBy("s", "cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda x: x["c"]
        ).alias("centroid")
    )
    from pyspark.sql.window import Window

    scored = sub.join(F.broadcast(codebook), "s").select(
        id_col,
        "s",
        "cid",
        F.round(l2sq(F.col("sv"), F.col("centroid")), round_digits).alias("d2"),
    )
    w = Window.partitionBy(id_col, "s").orderBy("d2", "cid")
    codes = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "s", F.col("cid").alias("code"))
    )
    return codebook, codes, sub


def pq_adc_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = 8,
    dsub: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache: bool = True,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, one
    ``m x ksub`` distance table against the codebook (tiny, broadcast);
    each corpus vector's approximate distance is the table sum over its
    codes — the corpus is never decoded.

    Distance bookkeeping is integer micro-units (each rounded subspace
    distance scaled by 1e6 into a BIGINT) so the m-way sum is exact and
    order-free on both engines; ranking ties break on neighbor id.

    Returns a LAZY frame; the caller owns materialization. With
    ``cache=True`` the corpus-scale subvector frame stays persisted for
    the lifetime of the returned frame's consumers — unpersist it via
    ``pq_release(out)`` / ``out._pq_sub.unpersist()`` after the last
    action, or pass ``cache=False`` (repo cache-flag convention)."""
    from pyspark.sql.window import Window

    codebook, codes, sub = pq_train_codes(
        df, m, dsub, ksub, id_col, vec_col, cache=cache
    )
    qsub = sub.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), "s", F.col("sv").alias("qsv")
    )
    table = qsub.join(codebook, "s").select(
        "query_id",
        "s",
        "cid",
        F.round(F.round(l2sq(F.col("qsv"), F.col("centroid")), 6) * 1e6)
        .cast("long")
        .alias("d2u"),
    )
    # alias both sides: codes and table share the `sub` lineage, so a
    # bare codes["s"] == table["s"] is a same-lineage self-join that Spark
    # only disambiguates via the failAmbiguousSelfJoin heuristic
    c, t = codes.alias("_pqc"), table.alias("_pqt")
    pairs = (
        c.join(
            F.broadcast(t),
            (F.col("_pqc.s") == F.col("_pqt.s"))
            & (F.col("_pqc.code") == F.col("_pqt.cid"))
            & (F.col(f"_pqc.{id_col}") != F.col("_pqt.query_id")),
        )
        .groupBy(F.col("_pqt.query_id"), F.col(f"_pqc.{id_col}").alias("neighbor_id"))
        .agg(F.sum("d2u").alias("du"))
    )
    w = Window.partitionBy("query_id").orderBy("du", "neighbor_id")
    out = (
        pairs.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("du").cast("double") / 1e6, 4).alias("approx_dist"),
            "rnk",
        )
    )
    # stash the cached subvector frame on the result so callers can release
    # it after their last action without re-deriving the PQ internals
    out._pq_sub = sub if cache else None
    return out


def pq_release(out: DataFrame) -> None:
    """Unpersist the corpus-scale subvector cache behind a
    :func:`pq_adc_topk` result (no-op for ``cache=False`` results)."""
    sub = getattr(out, "_pq_sub", None)
    if sub is not None:
        sub.unpersist()


def ann_recall(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Recall@k of the IVF index against the exact brute-force ground
    truth — the evaluation loop every ANN deployment runs before trusting
    an index configuration (recall is the IVF nprobe knob's contract).

    Per query: ``n_overlap`` = |IVF top-k ∩ exact top-k|, ``recall`` =
    n_overlap / k. Both paths use the repo's deterministic ranking
    (rounded cosine, id tie-break), so the measurement itself is
    bit-reproducible.

    Scale: the exact path is one corpus pass (queries broadcast); the IVF
    path touches nprobe/n_clusters of the corpus; the overlap join moves
    only (query, k) rows. Evaluating on a sampled query panel (here: the
    explicit ``query_ids``) is the standard practice — ground truth is
    O(n) per query, so the panel bounds the evaluation cost."""
    emb_q = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col)
    )
    exact = knn_topk(df, emb_q, k=k, id_col=id_col, vec_col=vec_col).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_knn_topk(
        df, query_ids, k=k, n_clusters=n_clusters, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, centroids=centroids,
    ).select("query_id", F.col("neighbor_id").alias("_ivf_n"))
    ex = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    iv = approx.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ivf")
    )
    ov = (
        exact.join(
            approx,
            (exact.query_id == approx.query_id)
            & (F.col("neighbor_id") == F.col("_ivf_n")),
        )
        .groupBy(exact.query_id)
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    return (
        ex.join(iv, "query_id")
        .join(ov, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            "n_ivf",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0)) / F.lit(float(k)), 4
            ).alias("recall"),
        )
    )


def dcg_weights_micro(k: int) -> list[int]:
    """Micro-unit DCG position weights: ``W[i] = round(1e6 / log2(i + 1))``
    for 1-based positions 1..k, as INTEGER LITERALS. Both the Spark plan
    and the DuckDB oracle consume this same Python-computed list, so no
    engine ever evaluates a transcendental — the ulp-divergence risk of
    Java vs DuckDB ``log2`` is designed out (CLAUDE.md integer-grid rule)."""
    import math

    return [int(1_000_000 / math.log2(i + 1) + 0.5) for i in range(1, k + 1)]


def retrieval_rank_eval(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Graded ranking quality of the IVF index against exact ground truth:
    MRR and nDCG@k, the retrieval metrics that complement :func:`ann_recall`
    (recall ignores ORDER; a serving index that finds all k neighbors in
    reversed order still needs flagging).

    Relevance grade of an IVF result = ``k + 1 - exact_rank`` when it
    appears in the exact top-k, else 0. DCG sums ``grade × W[pos]`` over
    IVF positions with the literal micro-unit weights of
    :func:`dcg_weights_micro`; IDCG sums the same over the exact list
    itself (the perfect ordering); nDCG = DCG/IDCG via INTEGER micro-unit
    division, so both engines round identically. MRR uses
    ``1_000_000 div first_hit_rank`` — integer again.

    Per query: ``(query_id, n_hits, first_hit_rank, rr, dcg_micro,
    idcg_micro, ndcg)``; ``first_hit_rank`` 0 and rr/ndcg 0.0 when the IVF
    list misses the exact top-k entirely.

    Scale: inherits the panel-evaluation shape of :func:`ann_recall` —
    exact path one corpus pass, IVF path nprobe/n_clusters of it, then
    (query × k)-row joins only."""
    weights = dcg_weights_micro(k)
    warr = F.array(*[F.lit(w) for w in weights])
    exact = knn_topk(df, _panel(df, query_ids, id_col, vec_col), k=k,
                     id_col=id_col, vec_col=vec_col)
    approx = ivf_knn_topk(
        df, query_ids, k=k, n_clusters=n_clusters, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, centroids=centroids,
    )
    ex = exact.select("query_id", "neighbor_id", F.col("rnk").alias("_ex_rnk"))
    iv = approx.select("query_id", "neighbor_id", "rnk")
    graded = iv.join(ex, ["query_id", "neighbor_id"], "left").select(
        "query_id",
        "rnk",
        "_ex_rnk",
        (
            F.coalesce(F.lit(k) + 1 - F.col("_ex_rnk"), F.lit(0)).cast("long")
            * F.element_at(warr, F.col("rnk")).cast("long")
        ).alias("_gain"),
    )
    per_q = graded.groupBy("query_id").agg(
        F.count("_ex_rnk").cast("long").alias("n_hits"),
        F.coalesce(
            F.min(F.when(F.col("_ex_rnk").isNotNull(), F.col("rnk"))), F.lit(0)
        ).cast("int").alias("first_hit_rank"),
        F.sum("_gain").cast("long").alias("dcg_micro"),
    )
    ideal = ex.select(
        "query_id",
        (
            (F.lit(k) + 1 - F.col("_ex_rnk")).cast("long")
            * F.element_at(warr, F.col("_ex_rnk")).cast("long")
        ).alias("_ig"),
    ).groupBy("query_id").agg(F.sum("_ig").cast("long").alias("idcg_micro"))
    return (
        per_q.join(ideal, "query_id")
        .select(
            "query_id",
            "n_hits",
            "first_hit_rank",
            (
                F.when(F.col("first_hit_rank") > 0,
                       F.expr("1000000 div first_hit_rank")).otherwise(F.lit(0))
                / 1e6
            ).alias("rr"),
            "dcg_micro",
            "idcg_micro",
            (F.expr("(dcg_micro * 1000000) div idcg_micro") / 1e6).alias("ndcg"),
        )
    )


def _panel(df: DataFrame, query_ids: list[int], id_col: str, vec_col: str) -> DataFrame:
    return df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col)
    )


def rbo_suffix_nano(k: int, p: float = 0.9) -> list[int]:
    """Truncated rank-biased-overlap SUFFIX weights as nano-unit INTEGER
    LITERALS (the dcg_weights_micro convention — no engine evaluates the
    geometric series): ``SUFFIX[m] = round(Σ_{d=m..k} (1−p)·p^(d−1)/d ·
    1e9)``, 1-based ``m``. A common pair first co-present at pooled depth
    ``m = max(rank_A, rank_B)`` contributes to every A_d with d ≥ m, so
    its total RBO gain is exactly SUFFIX[m] — turning the whole statistic
    into one integer sum over common pairs."""
    import math  # noqa: F401  (kept for parity with dcg_weights_micro)

    terms = [(1.0 - p) * p ** (d - 1) / d for d in range(1, k + 1)]
    return [int(sum(terms[m - 1 :]) * 1e9 + 0.5) for m in range(1, k + 1)]


def rbo_eval(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    p: float = 0.9,
    n_clusters: int = 8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010, truncated at k) between
    the IVF index ranking and the exact ground truth — the top-weighted
    list-similarity that completes the eval family next to recall@k
    (order-blind) and MRR/nDCG (relevance-graded): RBO compares the two
    RANKINGS directly, discounting depth geometrically, so an index that
    agrees on the first results but diverges in the tail scores near 1.

    Exactness: each common (query, neighbor) pair gains the integer
    nano-unit literal ``SUFFIX[max(exact_rank, ivf_rank)]``
    (:func:`rbo_suffix_nano`), so per-query RBO is ONE integer sum with a
    display division — bit-identical on any engine/partitioning. Returns
    ``(query_id, n_common, rbo)``; truncated RBO is the lower bound of
    the extrapolated score (residual mass ignored, documented).

    Scale: the panel-evaluation shape of :func:`ann_recall` — the overlap
    join and sum move only (query × k) rows."""
    suffix = rbo_suffix_nano(k, p)
    sarr = F.array(*[F.lit(s).cast("long") for s in suffix])
    exact = knn_topk(
        df, _panel(df, query_ids, id_col, vec_col), k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id", F.col("rnk").alias("_ex_rnk"))
    approx = ivf_knn_topk(
        df, query_ids, k=k, n_clusters=n_clusters, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, centroids=centroids,
    ).select("query_id", "neighbor_id", F.col("rnk").alias("_iv_rnk"))
    pairs = approx.join(exact, ["query_id", "neighbor_id"]).select(
        "query_id",
        F.element_at(
            sarr, F.greatest(F.col("_iv_rnk"), F.col("_ex_rnk")).cast("int")
        ).alias("_gain"),
    )
    spine = approx.select("query_id").distinct()
    per_q = pairs.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("_gain").cast("long").alias("_nano"),
    )
    return (
        spine.join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.round(F.coalesce("_nano", F.lit(0)) / 1e9, 4).alias("rbo"),
        )
    )


def contrastive_pairs(
    df: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive training-pair mining for embedding models: per anchor,
    the nearest SAME-label corpus vector (the positive) and the nearest
    OTHER-label vector (the hard negative — the informative kind; a random
    negative is trivially separable). One row per anchor:
    ``(query_id, pos_id, pos_sim, neg_id, neg_sim, margin)`` with
    ``margin = pos_sim - neg_sim`` (rounded sims, so the margin is exact).

    Scale: one broadcast-anchor corpus pass scores everything (the
    knn_topk device); the per-anchor argmax per side reuses the salted
    two-stage rank, then the two k=1 sides join on the anchor — anchor-
    panel-sized frames only after the scan."""
    anchors = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col),
        F.col(label_col).alias("_qlabel"),
    )
    q = F.broadcast(
        anchors.select(
            "query_id", F.col(vec_col).alias("_qvec"), "_qlabel"
        )
    )
    scored = (
        df.select(F.col(id_col), F.col(vec_col), F.col(label_col))
        .crossJoin(q)
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            (F.col(label_col) == F.col("_qlabel")).alias("_same"),
            F.round(
                cosine(
                    as_double_array(F.col(vec_col)), as_double_array(F.col("_qvec"))
                ).cast("double"),
                4,
            ).alias("cos_sim"),
        )
    )
    from pyspark.sql.window import Window

    def _top1(side: DataFrame, prefix: str) -> DataFrame:
        w1 = Window.partitionBy("query_id", "_salt").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        w2 = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        return (
            side.withColumn("_salt", F.col("neighbor_id") % 64)
            .withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") == 1)
            .withColumn("_r2", F.row_number().over(w2))
            .where(F.col("_r2") == 1)
            .select(
                "query_id",
                F.col("neighbor_id").alias(f"{prefix}_id"),
                F.col("cos_sim").alias(f"{prefix}_sim"),
            )
        )

    pos = _top1(scored.where(F.col("_same")), "pos")
    neg = _top1(scored.where(~F.col("_same")), "neg")
    return (
        pos.join(neg, "query_id")
        .select(
            "query_id", "pos_id", "pos_sim", "neg_id", "neg_sim",
            F.round(F.col("pos_sim") - F.col("neg_sim"), 4).alias("margin"),
        )
    )


def ivf_pq_refine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    shortlist: int = 20,
    n_clusters: int = 8,
    m: int = 8,
    dsub: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache: bool = True,
) -> DataFrame:
    """The production ANN serving stack in one operator — FAISS's
    IVF-PQ + refine pipeline: (1) the coarse quantizer prunes the corpus
    to the query's cell (nprobe=1 here; the knob is :func:`ivf_knn_topk`'s),
    (2) PQ/ADC scores the surviving candidates from 64×-compressed codes
    — integer micro-unit table sums, the corpus never decodes, (3) the
    top-``shortlist`` candidates re-rank EXACTLY from their full vectors
    and the top-``k`` emerge. Each stage cuts the work the next stage
    touches: cell ≈ corpus/n_clusters rows, ADC reads codes only, and
    full-precision math happens on ``shortlist`` rows per query.

    Returns ``(query_id, neighbor_id, approx_dist, cos_sim, rnk)`` —
    approx_dist is the ADC score that shortlisted the row, cos_sim the
    exact score that ranked it. Caller owns the caches via
    ``out._stage_caches`` (repo convention)."""
    from pyspark.sql.window import Window

    cents = ivf_centroids(df, n_clusters, id_col, vec_col).persist()
    assigned = ivf_assign(df, cents, id_col, vec_col).persist()
    q = assigned.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("cluster").alias("_qcluster"),
    )
    cand = assigned.join(
        F.broadcast(q.select("query_id", "_qcluster")),
        (F.col("cluster") == F.col("_qcluster"))
        & (F.col(id_col) != F.col("query_id")),
    ).select("query_id", F.col(id_col).alias("neighbor_id"))
    codebook, codes, sub = pq_train_codes(
        df, m, dsub, ksub, id_col, vec_col, cache=cache
    )
    qsub = sub.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), "s", F.col("sv").alias("qsv")
    )
    table = qsub.join(codebook, "s").select(
        "query_id",
        "s",
        "cid",
        F.round(F.round(l2sq(F.col("qsv"), F.col("centroid")), 6) * 1e6)
        .cast("long")
        .alias("d2u"),
    )
    c, t = codes.alias("_ipc"), table.alias("_ipt")
    adc = (
        c.join(
            F.broadcast(t),
            (F.col("_ipc.s") == F.col("_ipt.s"))
            & (F.col("_ipc.code") == F.col("_ipt.cid"))
            & (F.col(f"_ipc.{id_col}") != F.col("_ipt.query_id")),
        )
        .groupBy(
            F.col("_ipt.query_id").alias("query_id"),
            F.col(f"_ipc.{id_col}").alias("neighbor_id"),
        )
        .agg(F.sum("d2u").alias("du"))
        .join(cand, ["query_id", "neighbor_id"])  # IVF cell prune
    )
    ws = Window.partitionBy("query_id").orderBy("du", "neighbor_id")
    short = (
        adc.withColumn("_sr", F.row_number().over(ws))
        .where(F.col("_sr") <= shortlist)
        .select("query_id", "neighbor_id", "du")
    )
    full = df.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("_nvec"),
    )
    qv = F.broadcast(
        q.select("query_id", as_double_array(F.col("_qvec")).alias("_qd"))
    )
    rer = (
        short.join(full, "neighbor_id")
        .join(qv, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("du").cast("double") / 1e6, 4).alias("approx_dist"),
            F.round(cosine(F.col("_nvec"), F.col("_qd")).cast("double"), 4).alias(
                "cos_sim"
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    out = (
        rer.withColumn("rnk", F.row_number().over(wf).cast("int"))
        .where(F.col("rnk") <= k)
    )
    out._stage_caches = [cents, assigned] + ([sub] if cache else [])
    return out


def sq8_knn_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized (SQ8) brute-force top-k — the OTHER standard
    embedding compression next to PQ: each dimension maps to one byte via
    the corpus-wide per-dimension [min, max] range, and distances are
    exact INTEGER sums of squared code deltas (the int8-SIMD fast path a
    vector store runs when PQ's accuracy loss is too much; 4× memory cut
    instead of 64×).

    Codes are ``floor((x − min_d) · 255 / (max_d − min_d) + 0.5)`` clamped
    to [0, 255] — a single identical IEEE expression on both engines, so
    the byte codes and therefore every distance are bit-reproducible.
    Constant dimensions (max = min) map to code 0.

    Scale: the range table is one corpus aggregate of 2·d values
    (broadcast back); encoding is a map pass; the scan is the brute-force
    baseline's (queries broadcast, salted two-stage top-k)."""
    ranges = sq8_ranges(df, id_col, vec_col)
    coded = sq8_encode(df, ranges, id_col, vec_col)
    q = coded.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("_c").alias("_qc")
    )
    return sq8_scan_topk(coded, q, k, id_col)


def sq8_ranges(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension corpus ``(dim, lo, hi)`` range table — the trained
    state of the SQ8 quantizer (2·d doubles)."""
    v = df.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("_v"))
    dims = v.select(F.col(id_col), F.posexplode("_v").alias("dim", "x"))
    return dims.groupBy("dim").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )


def sq8_encode(
    df: DataFrame,
    ranges: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Byte-code the corpus against a (possibly re-ingested) range table:
    ``(id, _c array<long>)`` with the single shared floor expression —
    identical range DOUBLES give identical codes, which is why the index
    artifact stores ranges as hexfloats."""
    v = df.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("_v"))
    rarr = F.broadcast(
        ranges.groupBy().agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "lo", "hi"))),
                lambda s: F.struct(s["lo"].alias("lo"), s["hi"].alias("hi")),
            ).alias("_r")
        )
    )
    code = F.zip_with(
        F.col("_v"),
        F.col("_r"),
        lambda x, r: F.when(
            r["hi"] > r["lo"],
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    F.floor((x - r["lo"]) * 255.0 / (r["hi"] - r["lo"]) + 0.5),
                ),
            ),
        ).otherwise(F.lit(0)).cast("long"),
    )
    return v.crossJoin(rarr).select(F.col(id_col), code.alias("_c"))


def sq8_scan_topk(
    coded: DataFrame, q: DataFrame, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """The SQ8 integer scan over a coded frame against a coded query
    frame ``(query_id, _qc)`` — broadcast queries, exact integer
    squared-code distances, salted two-stage top-k."""
    from pyspark.sql.window import Window

    dist = F.aggregate(
        F.zip_with(F.col("_c"), F.col("_qc"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        coded.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            dist.alias("code_dist"),
        )
    )
    w1 = Window.partitionBy("query_id", "_salt").orderBy("code_dist", "neighbor_id")
    w2 = Window.partitionBy("query_id").orderBy("code_dist", "neighbor_id")
    return (
        scored.withColumn("_salt", F.col("neighbor_id") % 64)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .withColumn("rnk", F.row_number().over(w2).cast("int"))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "code_dist", "rnk")
    )


def mmr_diversified_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 3,
    pool: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998): re-rank the
    exact top-``pool`` candidates so the final ``k`` balance query
    relevance against redundancy —
    ``score = λ·sim(q, c) − (1−λ)·max_{s∈selected} sim(c, s)`` — the
    diversified-retrieval step between ANN search and a RAG context
    window (ten near-duplicate passages waste nine context slots).

    Greedy selection is inherently sequential in k, so the loop runs k
    rounds DRIVER-SIDE — but each round's work is DataFrame-only over the
    (queries × pool)-row candidate frame (persisted once): candidate-to-
    selected sims, a max, an argmax window. Nothing corpus-sized moves
    after the initial top-pool search. Scores round to 4 before every
    argmax (id tie-break) so selection is engine-exact.

    Emits ``(query_id, neighbor_id, cos_sim, mmr_score, pick)`` with
    ``pick`` = 1-based selection order. Caller releases ``out._stage_caches``."""
    from pyspark.sql.window import Window

    cand = (
        knn_topk(df, _panel(df, query_ids, id_col, vec_col), k=pool,
                 id_col=id_col, vec_col=vec_col)
        .join(
            df.select(
                F.col(id_col).alias("neighbor_id"),
                as_double_array(F.col(vec_col)).alias("_cv"),
            ),
            "neighbor_id",
        )
        .persist()
    )
    lam_l = F.lit(float(lam))
    first = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    sel = (
        cand.withColumn("_r", F.row_number().over(first))
        .where(F.col("_r") == 1)
        .select(
            "query_id", "neighbor_id", "cos_sim",
            F.col("cos_sim").alias("mmr_score"),
            F.lit(1).alias("pick"), "_cv",
        )
    )
    for step in range(2, k + 1):
        chosen = sel.select(
            "query_id",
            F.col("neighbor_id").alias("_sid"),
            F.col("_cv").alias("_sv"),
        )
        taken = sel.select(
            F.col("query_id").alias("_tq"), F.col("neighbor_id").alias("_taken")
        )
        remaining = cand.join(
            taken,
            (cand["query_id"] == taken["_tq"])
            & (cand["neighbor_id"] == taken["_taken"]),
            "left_anti",
        )
        scored = (
            remaining.join(F.broadcast(chosen), "query_id")
            .select(
                "query_id", "neighbor_id", "cos_sim", "_cv",
                F.round(cosine(F.col("_cv"), F.col("_sv")).cast("double"), 4)
                .alias("_ssim"),
            )
            .groupBy("query_id", "neighbor_id", "cos_sim")
            .agg(F.max("_ssim").alias("_red"), F.first("_cv").alias("_cv"))
            .select(
                "query_id", "neighbor_id", "cos_sim", "_cv",
                F.round(lam_l * F.col("cos_sim")
                        - (F.lit(1.0) - lam_l) * F.col("_red"), 4)
                .alias("mmr_score"),
            )
        )
        wpick = Window.partitionBy("query_id").orderBy(
            F.desc("mmr_score"), "neighbor_id"
        )
        nxt = (
            scored.withColumn("_r", F.row_number().over(wpick))
            .where(F.col("_r") == 1)
            .select(
                "query_id", "neighbor_id", "cos_sim", "mmr_score",
                F.lit(step).alias("pick"), "_cv",
            )
        )
        sel = sel.unionByName(nxt)
    out = sel.select("query_id", "neighbor_id", "cos_sim", "mmr_score", "pick")
    out._stage_caches = [cand]
    return out


def source_centroid_similarity(
    emb: DataFrame,
    docs: DataFrame,
    id_col: str = "vec_id",
    doc_id_col: str = "doc_id",
    group_col: str = "source",
    vec_col: str = "embedding",
) -> DataFrame:
    """Domain-similarity map: pairwise cosine between per-SOURCE embedding
    centroids — the measurement behind corpus-mixing decisions (two
    near-identical sources are redundant; an outlier source is either
    valuable diversity or junk). Centroids are per-(source, dim) averages
    rounded to the 1e-6 grid (the kmeans-oracle convention that absorbs
    partial-agg ulps), assembled into ordered arrays; cosines run over
    the |sources|-row centroid frame only — the corpus is touched once.
    Returns ``(src_a, src_b, cos)`` for src_a < src_b."""
    joined = emb.join(
        docs.select(F.col(doc_id_col).alias(id_col), F.col(group_col)), id_col
    )
    per_dim = (
        joined.select(group_col, F.posexplode(F.col(vec_col)).alias("dim", "x"))
        .groupBy(group_col, "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    cents = per_dim.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("v")
    )
    a = cents.select(F.col(group_col).alias("src_a"), F.col("v").alias("va"))
    b = cents.select(F.col(group_col).alias("src_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("src_a") < F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos"),
        )
    )


#: Per-vector cosine-to-centroid on the 1e-6 grid: dotc/nv/nc are EXACT
#: integer quadratics (DECIMAL/HUGEINT state), the cosine is one shared
#: double expression over them, snapped with floor(x·1e6 + 0.5).
CENTROID_COS_U_EXPR = (
    "case when nv > 0 and nc > 0 then "
    "cast(floor(cast(dotc as double) / sqrt(cast(nv as double)) "
    "/ sqrt(cast(nc as double)) * 1e6 + 0.5e0) as bigint) end"
)


def label_centroid_cohesion(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label embedding cohesion: every vector's cosine to its OWN
    label's (unnormalized) centroid, aggregated to the per-label mean and
    minimum — the drift/mislabel screen for embedding corpora ("has this
    shard's cluster gone diffuse", "which label hides off-cluster
    vectors"). The min is the outlier tail; the mean is the cohesion
    trend to alert on between snapshot versions.

    Exactness at any scale: components snap to the 1e-6 integer grid
    FIRST (float32 → double widening is exact, so both engines grid
    identically), per-label per-dimension centroid sums are integer
    (element order never matters), and all three quadratics (vec·cen,
    |vec|², |cen|²) accumulate in DECIMAL(38,0) — |cen|² alone passes
    BIGINT at ~100k vectors/label. The only double is the shared cosine
    expression, snapped to the 1e-6 grid per vector so the per-label MEAN
    is an exact integer ratio (no float-sum order dependence anywhere).
    Plan: one explode for the keyed centroid agg (map-side combinable),
    one broadcast join of the label-sized centroid frame back onto
    vectors — no self-joins, no windows. Returns one row per label
    ``(label, n_vecs, avg_cos, min_cos)``.
    """
    dec = "decimal(38,0)"
    micro = df.select(
        F.col(label_col).alias("label"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * 1e6).cast("long"),
        ).alias("v"),
    ).persist()  # two consumers: centroid explode + per-vector join
    cen = (
        micro.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.sum("x").cast("long").alias("s"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "s"))),
                lambda st: st["s"],
            ).alias("cen")
        )
        .select(
            "label",
            "cen",
            F.aggregate(
                F.col("cen"),
                F.lit(0).cast(dec),
                lambda acc, x: acc + x.cast(dec) * x,
            ).alias("nc"),
        )
    )
    per_vec = (
        micro.join(F.broadcast(cen), "label")
        .select(
            "label",
            F.aggregate(
                F.zip_with(F.col("v"), F.col("cen"), lambda a, b: a.cast(dec) * b),
                F.lit(0).cast(dec),
                lambda acc, x: acc + x,
            ).alias("dotc"),
            F.aggregate(
                F.col("v"),
                F.lit(0).cast(dec),
                lambda acc, x: acc + x.cast(dec) * x,
            ).alias("nv"),
            F.col("nc"),
        )
        .select("label", F.expr(CENTROID_COS_U_EXPR).alias("cos_u"))
    )
    out = per_vec.where(F.col("cos_u").isNotNull()).groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.expr("round(sum(cos_u) * 1e0 / count(1) / 1e6, 6)").alias("avg_cos"),
        F.expr("round(min(cos_u) * 1e0 / 1e6, 6)").alias("min_cos"),
    )
    out._stage_caches = [micro]
    return out
