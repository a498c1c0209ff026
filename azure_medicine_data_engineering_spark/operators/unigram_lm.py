"""Unigram-LM (SentencePiece-style) tokenizer training — the third
tokenizer family next to BPE (`operators/text.py:bpe_merge_train`) and
WordPiece serving (`text.py`): what T5/LLaMA-class pipelines actually
train.

Algorithm (Viterbi EM on an integer micro-grid, exactly replayable in
SQL):

1. **Word frame**: whitespace-split, lowercase ``[a-z]{1,16}`` words,
   distinct with frequencies — the trainer never touches the corpus
   again (the 100-TB contract: one collapse shuffle, then everything is
   distinct-word grain).
2. **Seed vocab**: every substring of length 1..``max_piece`` weighted
   by word frequency; keep ALL single characters (segmentability
   guarantee) + the top ``keep_multi`` multi-character pieces
   (count desc, piece asc).
3. **EM rounds**: piece costs are negative log-probs with Laplace
   smoothing, snapped to the 1e-6 grid through ONE shared expression
   string (``UNIGRAM_COST_EXPR`` — identical IEEE op sequence on both
   engines, the repo's ln-micro-grid discipline). The E-step Viterbi
   segments every distinct word by a position-DP unrolled over word
   offsets (edges = substring→vocab joins; argmin per position with the
   deterministic ``(cost, start)`` tie-break — smaller start = longer
   piece, the SentencePiece preference). Per-position frames are
   distinct-word grain and eagerly ``localCheckpoint``-ed (the BPE
   round discipline — kills the 2^n lineage blowup). The M-step counts
   pieces along the best paths (multiplicity-aware backtrace walk) and
   prunes the ``prune_per_round`` lowest-count multi-character pieces.
4. **Output**: the final vocab ``(piece, cnt, cost_micro)``.

Driver-side scalars are all bounded: max word length (one number), the
vocab total/size per round (1-row aggregates) — never data-sized.

Scale extension of the reference's text handling (the reference tokenizes
nothing; same class as the BPE trainer) — no counterpart file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Shared cost finalization (Laplace-smoothed unigram negative log-prob on
#: the 1e-6 grid): interpolated verbatim into the Spark plan AND the DuckDB
#: oracle so the double op sequence is identical — scientific literals per
#: the repo convention (1.0-style literals parse as DECIMAL in F.expr).
UNIGRAM_COST_EXPR = (
    "CAST(FLOOR(-ln((cnt * 1e0 + 1e0) / (total * 1e0 + nv * 1e0)) * 1e6"
    " + 0.5e0) AS BIGINT)"
)

#: Static position bound shared with the oracle's unrolled DP: words longer
#: than this are excluded from training on BOTH engines (SentencePiece caps
#: sentence-piece input length the same way).
MAX_WORD_LEN = 16


def unigram_word_frame(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency frame ``(w, f)`` — lowercase ``[a-z]``
    words of length 1..``MAX_WORD_LEN``. One shuffle (the groupBy);
    everything downstream is distinct-word grain."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.col("w").rlike("^[a-z]{1,%d}$" % MAX_WORD_LEN))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )


def _costed(vocab: DataFrame) -> DataFrame:
    """Attach micro-grid costs to a ``(piece, cnt)`` vocab frame via the
    shared expression; total/nv are 1-row driver scalars (bounded)."""
    row = vocab.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    ).collect()[0]
    return vocab.select(
        "piece",
        "cnt",
        F.lit(int(row["total"])).alias("total"),
        F.lit(int(row["nv"])).alias("nv"),
    ).selectExpr("piece", "cnt", f"{UNIGRAM_COST_EXPR} AS cost")


def _viterbi_piece_counts(
    words: DataFrame, cost_map: dict[str, int], max_piece: int
) -> DataFrame:
    """E-step: Viterbi-segment every distinct word under the integer
    micro-grid costs and emit frequency-weighted piece counts
    ``(piece, c)`` — ONE Arrow ``mapInPandas`` pass over the
    distinct-word frame (the DP is word-local, so no cross-row state;
    the oracle replays the identical DP in SQL and integer costs make
    the argmin engine-exact). Tie-break: minimal cost, then smallest
    start offset (= longest piece, the SentencePiece preference) —
    matching the oracle's ``ROW_NUMBER() OVER (ORDER BY cost, i)``.
    Partial aggregation per Arrow batch keeps the shuffle piece-grain."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    def run(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            agg: Counter = Counter()
            for w, f in zip(pdf["w"], pdf["f"]):
                w = str(w)
                n = len(w)
                best: list[int | None] = [None] * (n + 1)
                best[0] = 0
                choice: list[int | None] = [None] * (n + 1)
                for j in range(1, n + 1):
                    bc = bi = None
                    for i in range(max(0, j - max_piece), j):
                        if best[i] is None:
                            continue
                        c = cost_map.get(w[i:j])
                        if c is None:
                            continue
                        t = best[i] + c
                        if bc is None or t < bc:
                            bc, bi = t, i
                    best[j], choice[j] = bc, bi
                pos = n
                while pos:
                    i = choice[pos]
                    agg[w[i:pos]] += int(f)
                    pos = i
            yield pd.DataFrame(
                {"piece": list(agg.keys()), "c": [int(v) for v in agg.values()]}
            )

    schema = StructType(
        [StructField("piece", StringType()), StructField("c", LongType())]
    )
    return (
        words.mapInPandas(run, schema)
        .groupBy("piece")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def unigram_lm_train(
    df: DataFrame,
    text_col: str = "text",
    keep_multi: int = 48,
    prune_per_round: int = 8,
    rounds: int = 2,
    max_piece: int = 4,
) -> DataFrame:
    """Train a unigram-LM vocab; returns ``(piece, cnt, cost_micro)``.

    ``cnt`` is the round-``rounds`` Viterbi piece count (seed count for
    pieces the final round never used stays 0 via the left join);
    ``cost_micro`` the smoothed negative log-prob on the 1e-6 grid.
    """
    words = unigram_word_frame(df, text_col).localCheckpoint(eager=True)

    # --- seed: all substrings weighted by word frequency -------------
    starts = words.select(
        "w", "f", F.explode(F.sequence(F.lit(0), F.length("w") - 1)).alias("i")
    )
    spans = starts.select(
        "w",
        "f",
        "i",
        F.explode(
            F.sequence(
                F.lit(1), F.least(F.lit(max_piece), F.length("w") - F.col("i"))
            )
        ).alias("l"),
    )
    seed = (
        spans.selectExpr("substring(w, i + 1, l) AS piece", "f")
        .groupBy("piece")
        .agg(F.sum("f").cast("long").alias("cnt"))
    )
    singles = seed.where(F.length("piece") == 1)
    w_top = Window.orderBy(F.desc("cnt"), F.asc("piece"))
    multis = (
        seed.where(F.length("piece") > 1)
        .select("piece", "cnt", F.row_number().over(w_top).alias("rn"))
        .where(F.col("rn") <= keep_multi)
        .drop("rn")
    )
    vocab = singles.unionByName(multis).localCheckpoint(eager=True)

    for _r in range(rounds):
        # vocab-bounded driver collect (like the BPE candidate list):
        # the cost table is ~|vocab| rows, closed over by the kernel
        cost_map = {
            r["piece"]: int(r["cost"]) for r in _costed(vocab).collect()
        }
        counted = _viterbi_piece_counts(words, cost_map, max_piece)
        counts = (
            vocab.select("piece")
            .join(counted, "piece", "left")
            .select(
                "piece", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("cnt")
            )
        )
        # --- prune the lowest multi-char pieces -------------------------
        w_prune = Window.orderBy(F.asc("cnt"), F.asc("piece"))
        multi_kept = (
            counts.where(F.length("piece") > 1)
            .select("piece", "cnt", F.row_number().over(w_prune).alias("rn"))
            .where(F.col("rn") > prune_per_round)
            .drop("rn")
        )
        vocab = (
            counts.where(F.length("piece") == 1)
            .unionByName(multi_kept)
            .localCheckpoint(eager=True)
        )

    out = _costed(vocab).selectExpr(
        "piece", "cnt", "cost AS cost_micro"
    )
    out._stage_caches = []
    return out


def _viterbi_dp_ctes(
    tag: str, cost_cte: str, max_piece: int
) -> tuple[list[str], str, str]:
    """Unrolled Viterbi-DP + backtrace CTEs over ``words`` with piece
    costs from ``cost_cte``. Returns (parts, choice_cte, bt_prefix) —
    ``bt_prefix`` names the backtrace chain ``{bt_prefix}_1..L`` whose
    rows are the chosen pieces (one per segmentation step)."""
    L = MAX_WORD_LEN
    parts: list[str] = []
    parts.append(
        f"""edges{tag} AS MATERIALIZED (
  SELECT e.w, e.i, e.j, c.cost FROM (
    SELECT w.w, t.i, t.i + u.l AS j, substr(w.w, t.i + 1, u.l) AS piece
    FROM words w, range(0, {L}) t(i), range(1, {max_piece + 1}) u(l)
    WHERE t.i + u.l <= length(w.w)) e
  JOIN {cost_cte} c USING (piece)
),
ball{tag}_0 AS (SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS cost FROM words)"""
    )
    for p in range(1, L + 1):
        parts.append(
            f"""best{tag}_{p} AS MATERIALIZED (
  SELECT w, {p} AS pos, cost, i FROM (
    SELECT b.w, b.cost + e.cost AS cost, e.i,
           ROW_NUMBER() OVER (PARTITION BY b.w
                              ORDER BY b.cost + e.cost, e.i) AS rn
    FROM ball{tag}_{p - 1} b
    JOIN edges{tag} e ON e.w = b.w AND e.i = b.pos AND e.j = {p})
  WHERE rn = 1
),
ball{tag}_{p} AS MATERIALIZED (
  SELECT w, pos, cost FROM ball{tag}_{p - 1}
  UNION ALL SELECT w, pos, cost FROM best{tag}_{p}
)"""
        )
    choice_union = "\n  UNION ALL ".join(
        f"SELECT w, pos, i FROM best{tag}_{p}" for p in range(1, L + 1)
    )
    parts.append(f"choice{tag} AS MATERIALIZED (\n  {choice_union}\n)")
    parts.append(f"bt{tag}_0 AS (SELECT w, length(w) AS pos FROM words)")
    for s in range(1, L + 1):
        parts.append(
            f"""bt{tag}_{s} AS MATERIALIZED (
  SELECT b.w, c.i AS pos, substr(b.w, c.i + 1, b.pos - c.i) AS piece
  FROM bt{tag}_{s - 1} b JOIN choice{tag} c ON c.w = b.w AND c.pos = b.pos
  WHERE b.pos > 0
)"""
        )
    return parts, f"choice{tag}", f"bt{tag}"


def _train_parts(
    keep_multi: int,
    prune_per_round: int,
    rounds: int,
    max_piece: int,
) -> list[str]:
    """Shared CTE list replaying the FULL training (words → seed →
    vocab0 → unrolled EM rounds → vocab{rounds} + statf) — composed by
    :func:`unigram_lm_oracle` and the serving oracles."""
    L = MAX_WORD_LEN
    parts: list[str] = []
    parts.append(
        f"""words AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                  x -> regexp_matches(x, '^[a-z]{{1,{L}}}$'))) AS w
    FROM documents) GROUP BY w
),
seed AS MATERIALIZED (
  SELECT substr(w, i + 1, l) AS piece, CAST(SUM(f) AS BIGINT) AS cnt
  FROM words, range(0, {L}) t(i), range(1, {max_piece + 1}) u(l)
  WHERE i + l <= length(w)
  GROUP BY 1
),
vocab0 AS MATERIALIZED (
  SELECT piece, cnt FROM seed WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece ASC) AS rn
    FROM seed WHERE length(piece) > 1) WHERE rn <= {keep_multi}
)"""
    )
    for r in range(1, rounds + 1):
        v = f"vocab{r - 1}"
        parts.append(
            f"""stat{r} AS MATERIALIZED (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS nv
  FROM {v}
),
cost{r} AS MATERIALIZED (
  SELECT piece, {UNIGRAM_COST_EXPR} AS cost FROM {v}, stat{r}
)"""
        )
        dp_parts, _choice, bt = _viterbi_dp_ctes(str(r), f"cost{r}", max_piece)
        parts.extend(dp_parts)
        pieces_union = "\n  UNION ALL ".join(
            f"SELECT w, piece FROM {bt}_{s}" for s in range(1, L + 1)
        )
        parts.append(f"pieces{r} AS MATERIALIZED (\n  {pieces_union}\n)")
        parts.append(
            f"""counts{r} AS MATERIALIZED (
  SELECT v.piece, CAST(COALESCE(s.c, 0) AS BIGINT) AS cnt
  FROM {v} v LEFT JOIN (
    SELECT p.piece, SUM(wd.f) AS c
    FROM pieces{r} p JOIN words wd USING (w) GROUP BY p.piece) s
  USING (piece)
),
vocab{r} AS MATERIALIZED (
  SELECT piece, cnt FROM counts{r} WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt ASC, piece ASC) AS rn
    FROM counts{r} WHERE length(piece) > 1) WHERE rn > {prune_per_round}
)"""
        )
    parts.append(
        f"""statf AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS nv
  FROM vocab{rounds}
)"""
    )
    return parts


def unigram_lm_oracle(
    keep_multi: int = 48,
    prune_per_round: int = 8,
    rounds: int = 2,
    max_piece: int = 4,
) -> str:
    """DuckDB oracle for :func:`unigram_lm_train`: every EM round AND
    every Viterbi DP position unrolled as MATERIALIZED CTEs (the BPE
    oracle discipline — multi-referenced CTEs inline exponentially
    otherwise). Shares ``UNIGRAM_COST_EXPR`` verbatim."""
    body = ",\n".join(_train_parts(keep_multi, prune_per_round, rounds, max_piece))
    return (
        f"WITH {body}\n"
        f"SELECT piece, cnt, {UNIGRAM_COST_EXPR} AS cost_micro\n"
        f"FROM vocab{rounds}, statf"
    )


def _viterbi_word_npieces(
    words: DataFrame, cost_map: dict[str, int], max_piece: int
) -> DataFrame:
    """SERVE-side Viterbi: segment every distinct word under the FINAL
    trained costs and emit ``(w, n_pieces)`` — the same word-local DP
    and ``(cost, start)`` tie-break as the E-step kernel, one Arrow
    mapInPandas pass."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for w in pdf["w"]:
                w = str(w)
                n = len(w)
                best: list[int | None] = [None] * (n + 1)
                best[0] = 0
                choice: list[int | None] = [None] * (n + 1)
                for j in range(1, n + 1):
                    bc = bi = None
                    for i in range(max(0, j - max_piece), j):
                        if best[i] is None:
                            continue
                        c = cost_map.get(w[i:j])
                        if c is None:
                            continue
                        t = best[i] + c
                        if bc is None or t < bc:
                            bc, bi = t, i
                    best[j], choice[j] = bc, bi
                pos, count = n, 0
                while pos:
                    count += 1
                    pos = choice[pos]
                rows.append((w, count))
            yield pd.DataFrame(rows, columns=["w", "n_pieces"])

    schema = StructType(
        [StructField("w", StringType()), StructField("n_pieces", LongType())]
    )
    return words.select("w").mapInPandas(run, schema)


def unigram_fertility_by_group(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    keep_multi: int = 48,
    prune_per_round: int = 8,
    rounds: int = 2,
    max_piece: int = 4,
) -> DataFrame:
    """Tokenizer FERTILITY per corpus slice under the trained unigram-LM
    vocab — the number every tokenizer evaluation quotes (pieces per
    word; fertility >> 1 on a slice means the vocab serves it badly and
    its token budget explodes). Trains via :func:`unigram_lm_train`,
    collects the vocab-bounded final cost table, Viterbi-segments the
    DISTINCT word frame once (serve kernel), and joins the per-(group,
    word) counts back — the corpus is never re-segmented per row.
    Returns ``(g, n_words, n_pieces, fertility)`` with fertility an
    exact micro-grid integer division (both engines)."""
    vocab = unigram_lm_train(
        df, text_col, keep_multi, prune_per_round, rounds, max_piece
    )
    cost_map = {
        r["piece"]: int(r["cost_micro"]) for r in vocab.collect()
    }  # vocab-bounded driver collect (the BPE candidate-list class)
    gw = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"),
        )
        .where(F.col("w").rlike("^[a-z]{1,%d}$" % MAX_WORD_LEN))
        .groupBy("g", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    distinct_w = gw.select("w").distinct().localCheckpoint(eager=True)
    stats = _viterbi_word_npieces(distinct_w, cost_map, max_piece)
    return (
        gw.join(stats, "w")
        .groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_pieces")).cast("long").alias("n_pieces"),
        )
        .select(
            "g",
            "n_words",
            "n_pieces",
            (F.expr("n_pieces * 1000000 div n_words") / 1e6).alias("fertility"),
        )
    )


def unigram_fertility_oracle(
    group_col: str = "source",
    keep_multi: int = 48,
    prune_per_round: int = 8,
    rounds: int = 2,
    max_piece: int = 4,
) -> str:
    """DuckDB oracle for :func:`unigram_fertility_by_group`: the FULL
    training replay (:func:`_train_parts`) plus a final-cost CTE and one
    more unrolled serve DP whose backtrace rows are COUNTED per word."""
    L = MAX_WORD_LEN
    parts = _train_parts(keep_multi, prune_per_round, rounds, max_piece)
    parts.append(
        f"""costf AS MATERIALIZED (
  SELECT piece, {UNIGRAM_COST_EXPR} AS cost FROM vocab{rounds}, statf
)"""
    )
    dp_parts, _choice, bt = _viterbi_dp_ctes("s", "costf", max_piece)
    parts.extend(dp_parts)
    steps_union = "\n  UNION ALL ".join(
        f"SELECT w FROM {bt}_{s}" for s in range(1, L + 1)
    )
    parts.append(
        f"""wstats AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_pieces
  FROM (\n  {steps_union}\n) GROUP BY w
),
gw AS MATERIALIZED (
  SELECT {group_col} AS g, w, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT {group_col},
           unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                  x -> regexp_matches(x, '^[a-z]{{1,{L}}}$'))) AS w
    FROM documents) GROUP BY 1, 2
)"""
    )
    body = ",\n".join(parts)
    return (
        f"WITH {body}\n"
        "SELECT g, CAST(SUM(c) AS BIGINT) AS n_words,\n"
        "       CAST(SUM(c * s.n_pieces) AS BIGINT) AS n_pieces,\n"
        "       (SUM(c * s.n_pieces) * 1000000 // SUM(c)) / 1e6 AS fertility\n"
        "FROM gw JOIN wstats s USING (w)\n"
        "GROUP BY g"
    )
