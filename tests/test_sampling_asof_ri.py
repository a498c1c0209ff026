"""Unit tests: deterministic sampling, as-of joins, referential integrity,
IVF assignment sanity."""

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)


def test_hash_sample_deterministic_and_proportional(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    s1 = hash_sample(df, "k", 0.3)
    s2 = hash_sample(df.repartition(13), "k", 0.3)
    n1, n2 = s1.count(), s2.count()
    assert n1 == n2                      # partitioning-independent
    assert abs(n1 / 10_000 - 0.3) < 0.02  # proportional
    # subset property: a 10% sample is contained in the 30% sample
    s_small = hash_sample(df, "k", 0.1)
    assert s_small.exceptAll(s1).count() == 0


def test_stratified_hash_sample(spark):
    df = spark.range(8_000).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).cast("string").alias("s")
    )
    out = stratified_hash_sample(df, "k", "s", {"true": 0.5, "false": 0.1})
    by = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert abs(by["true"] / 4000 - 0.5) < 0.05
    assert abs(by["false"] / 4000 - 0.1) < 0.05


def test_asof_join_picks_latest_within_horizon(spark):
    from azure_medicine_data_engineering_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u", "2024-01-01 10:00:00")], "event_id int, user string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            ("u", "2024-01-01 09:59:00", 100),  # latest within horizon → picked
            ("u", "2024-01-01 09:30:01", 101),  # older, in horizon
            ("u", "2024-01-01 09:20:00", 102),  # outside 30-minute horizon
            ("u", "2024-01-01 10:00:01", 103),  # in the future → excluded
        ],
        "user string, ts string, rid int",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(
        left, right, on="user", window_seconds=1800, left_id="event_id", tiebreak="rid"
    ).collect()
    assert len(out) == 1 and out[0].rid_r == 100


def test_referential_integrity_planted_orphans(spark):
    from azure_medicine_data_engineering_spark.operators.quality import (
        ForeignKey,
        referential_integrity_report,
    )

    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    child = spark.createDataFrame([(1,), (2,), (7,), (8,), (None,)], "fk int")
    rep = referential_integrity_report(
        child, parent, [ForeignKey("child->parent", "fk", "pk")]
    ).collect()
    # 7, 8 and NULL don't match any parent key → 3 orphans
    assert rep[0].number == 3


def test_ivf_assignment_covers_corpus(spark):
    from azure_medicine_data_engineering_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_centroids(emb, n_clusters=4)
    assert cents.count() == 4
    assigned = ivf_assign(emb, cents)
    assert assigned.count() == emb.count()          # every vector assigned
    assert assigned.select("cluster").distinct().count() <= 4


def test_weighted_sample_prefers_heavy_keys(spark):
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.sampling import (
        weighted_sample_keys,
    )

    # 500 keys; keys 0-9 carry 1000x the weight of the rest — a weighted
    # sample of 20 must include most of them, a uniform one would not
    df = spark.range(500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 10, 100000.0).otherwise(100.0).alias("w"),
    )
    out = weighted_sample_keys(df, "k", F.col("w"), k=20)
    picked = {r.k for r in out.collect()}
    assert len(picked) == 20
    assert len(picked & set(range(10))) >= 8

    # determinism: same call, same sample
    again = {r.k for r in weighted_sample_keys(df, "k", F.col("w"), k=20).collect()}
    assert picked == again


def test_trained_ivf_quantizer_beats_idmod_and_nprobe_knob_works(spark):
    """The kmeans_fit codebook must quantize better than the id-mod init it
    starts from (higher mean assignment similarity — the objective Lloyd
    improves), and the trained serving path's nprobe knob must be monotone
    in recall. On these synthetic near-uniform embeddings raw recall of
    trained vs id-mod is a coin flip (no cluster structure to learn), so
    the quantization objective is the honest assertion."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.similarity import (
        as_double_array,
        cosine,
        ivf_assign,
        ivf_centroids,
        ivf_knn_topk,
        kmeans_fit,
        knn_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def avg_assign_sim(cents):
        return (
            ivf_assign(emb, cents)
            .join(cents, "cluster")
            .select(
                cosine(
                    as_double_array(F.col("embedding")), F.col("centroid")
                ).alias("cs")
            )
            .agg(F.avg("cs"))
            .first()[0]
        )

    untrained = avg_assign_sim(ivf_centroids(emb, 8))
    cents, _ = kmeans_fit(emb, k=8, iterations=2)
    trained = avg_assign_sim(cents)
    assert trained > untrained

    q = emb.where("vec_id < 5").selectExpr("vec_id AS query_id", "embedding")
    truth = {(r.query_id, r.neighbor_id) for r in knn_topk(emb, q, k=10).collect()}

    def recall(nprobe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_knn_topk(
                emb, [0, 1, 2, 3, 4], k=10, n_clusters=8,
                nprobe=nprobe, centroids=cents,
            ).collect()
        }
        return len(got & truth) / len(truth)

    r1, r2 = recall(1), recall(2)
    assert 0.0 < r1 <= r2 <= 1.0


def test_quota_sample_rejects_infeasible_targets(spark):
    import pytest
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.sampling import quota_sample

    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("books").alias("domain"),
    )
    with pytest.raises(ValueError, match="absent"):
        quota_sample(df, "k", "domain", {"web": 0.5, "code": 0.5})
    with pytest.raises(ValueError, match="> 0"):
        quota_sample(df, "k", "domain", {"web": 0.5, "books": 0.0})
    with pytest.raises(ValueError, match="non-empty"):
        quota_sample(df, "k", "domain", {})


def test_temperature_upsample_flattens_mixture(spark):
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.sampling import (
        temperature_upsample,
    )

    # 900 'big' rows vs 100 'small' rows; alpha=0.5 must pull shares toward
    # each other (natural 0.9/0.1 -> sqrt-flattened 0.75/0.25)
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 900, "big").otherwise("small").alias("s"),
    )
    up = temperature_upsample(df, key="k", strata_col="s", alpha=0.5)
    out = {r.s: r.n for r in up.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(out.values())
    big_share = out["big"] / total
    assert 0.70 < big_share < 0.80          # flattened from 0.9
    assert out["small"] > 100               # low-resource stratum upsampled
    # determinism: copies are stable
    again = {r.s: r.n for r in temperature_upsample(df, "k", "s", 0.5)
             .groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert out == again


def test_epoch_shuffle_is_exact_permutation_and_seed_sensitive(spark):
    from azure_medicine_data_engineering_spark.operators.sampling import epoch_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df, key="doc_id", seed=1, shard_size=50).cache()
    rows = {r.doc_id: (r.pos, r.shard_id) for r in out.collect()}
    # dense bijection onto [0, N) and consistent shard math
    assert sorted(p for p, _ in rows.values()) == list(range(500))
    assert all(s == p // 50 for p, s in rows.values())
    # repartition-invariant (nothing depends on partition arrival order)
    again = {
        r.doc_id: r.pos
        for r in epoch_shuffle(
            df.repartition(13), key="doc_id", seed=1, shard_size=50
        ).collect()
    }
    assert again == {k: p for k, (p, _) in rows.items()}
    # a different seed re-deals the permutation
    other = {
        r.doc_id: r.pos
        for r in epoch_shuffle(df, key="doc_id", seed=2, shard_size=50).collect()
    }
    assert other != {k: p for k, (p, _) in rows.items()}
    out.unpersist()


def test_retrieval_rank_eval_perfect_when_index_is_exact(spark):
    from azure_medicine_data_engineering_spark.operators.similarity import (
        retrieval_rank_eval,
    )

    # deterministic toy corpus, 30 vectors in R^4
    rows = [
        (i, [float((i * 7 + d * 3) % 11 - 5) for d in range(4)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # one coarse cell -> IVF search IS the exact search -> perfect metrics
    perfect = retrieval_rank_eval(df, query_ids=[0, 1], k=5, n_clusters=1).collect()
    assert len(perfect) == 2
    for r in perfect:
        assert (r.n_hits, r.first_hit_rank, r.rr, r.ndcg) == (5, 1, 1.0, 1.0)
        assert r.dcg_micro == r.idcg_micro
    # partitioned index: metrics stay in [0, 1] and idcg is the fixed ideal
    parts = retrieval_rank_eval(df, query_ids=[0, 1], k=5, n_clusters=5).collect()
    for r in parts:
        assert 0.0 <= r.ndcg <= 1.0 and 0.0 <= r.rr <= 1.0
        assert r.idcg_micro == perfect[0].idcg_micro


def test_contrastive_pairs_planted_geometry(spark):
    from azure_medicine_data_engineering_spark.operators.similarity import (
        contrastive_pairs,
    )

    rows = [
        (0, [1.0, 0.0], 1),     # anchor, label 1
        (1, [0.9, 0.1], 1),     # closest same-label -> positive
        (2, [0.0, 1.0], 1),     # far same-label
        (3, [0.8, 0.2], 2),     # closest other-label -> hard negative
        (4, [-1.0, 0.0], 2),    # far other-label
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.query_id: r for r in contrastive_pairs(df, query_ids=[0]).collect()}
    r = out[0]
    assert (r.pos_id, r.neg_id) == (1, 3)
    assert r.pos_sim > r.neg_sim and abs(r.margin - round(r.pos_sim - r.neg_sim, 4)) < 1e-9


def test_token_budget_waterfill_exact_and_fair(spark):
    from azure_medicine_data_engineering_spark.operators.sampling import (
        token_budget_waterfill,
    )

    # sources with 10 / 50 / 100 / 200 tokens (1 token per word)
    rows = []
    for src, n in [("a", 10), ("b", 50), ("c", 100), ("d", 200)]:
        rows.append((src, " ".join(["w"] * n)))
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.source: r for r in token_budget_waterfill(df, budget=200).collect()}
    # waterfill at T=200 over caps (10,50,100,200): level segment at i=3:
    # prefix 60, remaining 2 -> L = 70, alloc = 10, 50, 70, 70
    assert {s: r.alloc_tokens for s, r in out.items()} == {
        "a": 10, "b": 50, "c": 70, "d": 70
    }
    assert {s: r.capped for s, r in out.items()} == {
        "a": False, "b": False, "c": True, "d": True
    }
    assert sum(r.alloc_tokens for r in out.values()) == 200
    # budget >= total: nothing capped
    all_out = token_budget_waterfill(df, budget=1000).collect()
    assert all(not r.capped and r.alloc_tokens == r.n_tokens for r in all_out)
    # odd budget: remainder lands deterministically, sum still exact
    odd = token_budget_waterfill(df, budget=201).collect()
    assert sum(r.alloc_tokens for r in odd) == 201


def test_ivf_pq_refine_ranks_by_exact_cosine(spark):
    from azure_medicine_data_engineering_spark.operators.similarity import (
        ivf_pq_refine_topk,
    )

    rows = [
        (i, [float((i * 13 + d * 5) % 17 - 8) for d in range(16)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivf_pq_refine_topk(
        df, query_ids=[0], k=3, shortlist=8, n_clusters=1, m=4, dsub=4, ksub=8
    )
    got = out.collect()
    assert len(got) == 3
    # final ranking is by the EXACT cosine, descending, rank contiguous
    sims = [r.cos_sim for r in sorted(got, key=lambda r: r.rnk)]
    assert sims == sorted(sims, reverse=True)
    assert [r.rnk for r in sorted(got, key=lambda r: r.rnk)] == [1, 2, 3]
    for c in out._stage_caches:
        c.unpersist()


def test_sq8_codes_preserve_neighborhood(spark):
    from azure_medicine_data_engineering_spark.operators.similarity import (
        sq8_knn_topk,
    )

    # anchor at origin-ish, one very close vector, one far
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [0.1, 0.0, 0.0, 0.0]),      # nearest
        (2, [10.0, 10.0, 10.0, 10.0]),  # farthest
        (3, [5.0, 5.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(
        sq8_knn_topk(df, query_ids=[0], k=3).collect(), key=lambda r: r.rnk
    )
    assert [r.neighbor_id for r in got] == [1, 3, 2]
    assert got[0].code_dist < got[1].code_dist < got[2].code_dist


def test_mmr_prefers_diverse_over_redundant(spark):
    from azure_medicine_data_engineering_spark.operators.similarity import (
        mmr_diversified_topk,
    )

    # query on the x-axis; 1 and 3 equally relevant on OPPOSITE sides of it
    # (tie broken to 1), 2 a near-duplicate of 1. MMR must take 3 next:
    # same relevance, far lower redundancy to the already-picked 1.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.43, 0.0]),
        (2, [0.9, 0.44, 0.0]),
        (3, [0.9, -0.43, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = mmr_diversified_topk(df, query_ids=[0], k=2, pool=3, lam=0.7)
    got = sorted(out.collect(), key=lambda r: r.pick)
    # pick 1 = the best match (tie-break); pick 2 = the diverse doc
    assert got[0].neighbor_id == 1
    assert got[1].neighbor_id == 3
    assert got[1].mmr_score < got[1].cos_sim  # redundancy penalty applied
    for c in out._stage_caches:
        c.unpersist()


def test_rbo_suffix_weights_naive():
    """SUFFIX[m] must equal the naive truncated-RBO tail sum; identical
    lists then score SUFFIX[1]/1e9 == (1-p)*sum p^(d-1) (A_d = 1)."""
    from azure_medicine_data_engineering_spark.operators.similarity import (
        rbo_suffix_nano,
    )

    k, p = 10, 0.9
    sfx = rbo_suffix_nano(k, p)
    for m in range(1, k + 1):
        naive = sum((1 - p) * p ** (d - 1) / d for d in range(m, k + 1))
        assert sfx[m - 1] == int(naive * 1e9 + 0.5)
    # pair-sum identity: identical length-k lists -> every depth d adds
    # exactly one NEW common pair at m=d, so sum SUFFIX[d] == full RBO
    full = sum((1 - p) * p ** (d - 1) for d in range(1, k + 1))
    assert abs(sum(sfx) / 1e9 - full) < 1e-6


def test_rbo_eval_identical_and_disjoint(spark):
    """A query whose IVF list equals the exact list must score the full
    truncated RBO; the statistic is 0 when the lists are disjoint. Build
    a 2-cluster geometry where cluster membership decides everything."""
    import math

    from azure_medicine_data_engineering_spark.operators.similarity import (
        rbo_eval,
        rbo_suffix_nano,
    )

    # 12 vectors on a ring: ids 0..5 near angle 0, ids 6..11 near pi/2 —
    # with id-mod-2 clustering the IVF cell mixes both groups, but for
    # query 0 the exact top-k are the nearby ids regardless.
    rows = []
    for i in range(12):
        ang = 0.015 * i if i < 6 else (math.pi / 2 + 0.015 * (i - 6))
        rows.append((i, [math.cos(ang), math.sin(ang)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.query_id: (r.n_common, r.rbo)
        for r in rbo_eval(
            df, query_ids=[0], k=5, p=0.9, n_clusters=1, nprobe=1
        ).collect()
    }
    # n_clusters=1: IVF == exact brute force -> full truncated RBO@5
    full5 = round(sum(rbo_suffix_nano(5, 0.9)) / 1e9, 4)
    assert out[0] == (5, full5)


def test_source_centroid_similarity_geometry(spark):
    """Two sources with identical vectors -> cosine 1; orthogonal
    sources -> 0; output covers each unordered pair once."""
    from azure_medicine_data_engineering_spark.operators.similarity import (
        source_centroid_similarity,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]), (1, [1.0, 0.0]),   # sA
            (2, [1.0, 0.0]), (3, [1.0, 0.0]),   # sB (same direction as sA)
            (4, [0.0, 1.0]), (5, [0.0, 1.0]),   # sC (orthogonal)
        ],
        "vec_id long, embedding array<double>",
    )
    docs = spark.createDataFrame(
        [(0, "sA"), (1, "sA"), (2, "sB"), (3, "sB"), (4, "sC"), (5, "sC")],
        "doc_id long, source string",
    )
    got = {
        (r["src_a"], r["src_b"]): r["cos"]
        for r in source_centroid_similarity(emb, docs).collect()
    }
    assert set(got) == {("sA", "sB"), ("sA", "sC"), ("sB", "sC")}
    assert got[("sA", "sB")] == 1.0
    assert got[("sA", "sC")] == 0.0 and got[("sB", "sC")] == 0.0
