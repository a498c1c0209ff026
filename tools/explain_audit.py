"""Plan-quality audit: runs .explain("formatted") over the registered queries
and reports physical-plan health — filter pushdown, column pruning (ReadSchema
width), broadcast vs sort-merge joins, exchange (shuffle) counts, and any
single-partition exchanges or cartesian products on non-aggregated inputs.

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _count_unique(plan: str, node_pattern: str) -> int:
    """Count distinct plan nodes, not textual occurrences: a persisted
    (InMemoryRelation) subtree is printed once per consumer but executed
    once — formatted explain reuses the node id, so dedupe on it. The
    match is line-anchored so detail-section headers ("(3) Exchange") don't
    bleed into the next node's id."""
    return len(set(re.findall(rf"(?:{node_pattern})[^\n(]*\((\d+)\)", plan)))


def _cached_subtree_ids(plan: str) -> set[int]:
    """Node ids living UNDER an InMemoryRelation in any printed tree
    section: formatted explain inlines the cached plan's FILL subtree per
    consumer, so its scans/exchanges print once per reference while
    executing at most once (zero times if the cache is already
    materialized). The audit reports them separately instead of counting
    them as per-execution work."""
    ids: set[int] = set()
    imr_stack: list[int] = []  # name positions of open InMemoryRelation nodes
    in_tree = False
    for line in plan.splitlines():
        if line.startswith("== Physical Plan ==") or line.startswith("Subquery:"):
            in_tree = True
            imr_stack = []
            continue
        if re.match(r"^\(\d+\) ", line):
            in_tree = False
            continue
        if not in_tree:
            continue
        m = _TREE_LINE.match(line)
        if not m:
            continue
        pos = m.start("name")
        while imr_stack and pos <= imr_stack[-1]:
            imr_stack.pop()
        if imr_stack:
            ids.add(int(m.group("id")))
        if m.group("name").startswith("InMemoryRelation"):
            imr_stack.append(pos)
    return ids


def audit(name: str, plan: str) -> dict:
    cached = _cached_subtree_ids(plan)
    scan_ids = set(
        int(i) for i in re.findall(r"Scan parquet[^\n(]*\((\d+)\)", plan)
    )
    return {
        "exchanges": _count_unique(plan, r"\bExchange\b"),
        # formatted explain puts partitioning in the details section;
        # grand-total (1-row) aggregates legitimately show one of these.
        "single_partition": len(re.findall(r"Arguments: SinglePartition", plan)),
        "broadcast_joins": _count_unique(plan, r"BroadcastHashJoin"),
        "sortmerge_joins": _count_unique(plan, r"SortMergeJoin"),
        "nested_loop": _count_unique(plan, r"BroadcastNestedLoopJoin|CartesianProduct"),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "scans": len(scan_ids - cached),
        "cache_fill_scans": len(scan_ids & cached),
        # Spark 4 formatted explain annotates codegen as "[codegen id : N]"
        # (the tree-node "WholeStageCodegen (N)" form only appears in simple
        # mode) — count distinct codegen ids across both syntaxes
        "codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"\[codegen id : (\d+)\]", plan))
        ),
        "read_cols": [
            len(s.split(",")) for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        ],
    }


#: Wrapper nodes between an Exchange and its semantic consumer in the
#: formatted tree (AQE stage boundaries, reuse markers).
_TREE_WRAPPERS = {"ShuffleQueryStage", "AQEShuffleRead", "ReusedExchange", "InputAdapter"}

_TREE_LINE = re.compile(
    r"^(?P<pre>[\s:+\-]*)(?:\* )?(?P<name>[A-Za-z][\w .]*?) \((?P<id>\d+)\)(?:,.*)?$"
)


def _plan_structures(plan: str):
    """Shared structural parse of a formatted explain: per-node detail
    blocks, parent sets, and child sets.

    Tree sections are parsed by indentation (each level is 3 chars; the
    codegen ``* `` adds 2, never enough to jump a level); detail blocks by
    node id. A plan can print several trees (AQE initial/final,
    subqueries) — parent/child resolutions are collected across all of
    them (sets; a merge can only make licensing MORE conservative)."""
    details: dict[int, str] = {}
    for m in re.finditer(
        r"^\((\d+)\) ([A-Za-z][\w .]*?)(?: \[codegen[^\]]*\])?$"
        r"(.*?)(?=^\(\d+\) |\Z)",
        plan,
        re.M | re.S,
    ):
        details[int(m.group(1))] = m.group(2) + "\n" + m.group(3)
    parents: dict[int, set[int]] = {}
    children: dict[int, set[int]] = {}
    stack: list[tuple[int, int]] = []  # (name_pos, node_id)
    in_tree = False
    # An InMemoryRelation's cached AdaptiveSparkPlan prints EMBEDDED
    # "== Final Plan ==" / "== Initial Plan ==" blocks whose indentation
    # RESTARTS at the header's column — feeding those lines to the stack
    # walk corrupts parentage for everything after them (observed: the
    # drift panel's scalar-broadcast build sides lost their parents, and
    # pure geometry cannot separate the block's last lines from the
    # resuming sibling). The reliable separator is ID ORDER: formatted
    # explain assigns ids depth-first, so every node of the cached fill
    # plan has id <= the cached AdaptiveSparkPlan's id, while the outer
    # tree resumes with a LATER id (the fill block and its ASP were
    # numbered before any following sibling). Skip embedded lines by that
    # threshold.
    cached_asp: int | None = None  # ASP id of the IMR whose fill prints next
    embed_thr: int | None = None  # active embedded-block id threshold
    estack: list[tuple[int, int]] = []  # embedded block's own stack
    for line in plan.splitlines():
        if line.startswith("== Physical Plan ==") or line.startswith("Subquery:"):
            in_tree = True
            stack = []
            cached_asp = embed_thr = None
            continue
        if re.match(r"^\(\d+\) ", line):
            in_tree = False
            continue
        if not in_tree:
            continue
        eh = re.search(r"== (?:Final|Initial) Plan ==", line)
        if eh:
            # TOP-LEVEL AQE headers (directly under the root
            # AdaptiveSparkPlan) are harmless; an EMBEDDED header prints
            # SHALLOWER than its InMemoryRelation context — that
            # indentation restart is the corruption signature. The block
            # is parsed as its OWN subtree rooted at the cached ASP (its
            # fill-plan exchanges/aggs need licensing structure too).
            if stack and stack[-1][0] > eh.start() and cached_asp is not None:
                embed_thr = cached_asp
                estack = [(eh.start() - 1, cached_asp)]
            continue
        m = _TREE_LINE.match(line)
        if not m:
            continue
        pos = m.start("name")
        nid = int(m.group("id"))
        if embed_thr is not None:
            if nid <= embed_thr:
                # inside the embedded cache-fill block: ids are assigned
                # depth-first, so every fill node's id <= the ASP's id
                # while the outer tree resumes with a later id
                while estack and estack[-1][0] >= pos:
                    estack.pop()
                if estack:
                    parents.setdefault(nid, set()).add(estack[-1][1])
                    children.setdefault(estack[-1][1], set()).add(nid)
                estack.append((pos, nid))
                continue
            embed_thr = None
        while stack and stack[-1][0] >= pos:
            stack.pop()
        if stack:
            parents.setdefault(nid, set()).add(stack[-1][1])
            children.setdefault(stack[-1][1], set()).add(nid)
            if m.group("name").startswith("AdaptiveSparkPlan") and details.get(
                stack[-1][1], ""
            ).split("\n", 1)[0].startswith("InMemoryRelation"):
                cached_asp = nid
        stack.append((pos, nid))
    return details, parents, children


def _global_agg_ids(details: dict[int, str]) -> set[int]:
    return {
        i for i, blk in details.items()
        if "Aggregate" in blk.split("\n", 1)[0] and re.search(r"^Keys: \[\]", blk, re.M)
    }


def sp_exchange_license(plan: str) -> tuple[int, int]:
    """STRUCTURAL licensing of single-partition exchanges: an SP exchange
    is benign iff its nearest non-wrapper PARENT in the physical tree is a
    global aggregate (``Keys: []`` — it then moves one partial-agg row per
    upstream partition, not data). Returns ``(n_sp, n_licensed)``.

    Counting ``Keys: []`` lines globally would also license a DATA-sized
    SP exchange (e.g. an unpartitioned window) any time a global agg
    appears elsewhere in the same plan — hence the per-node tree walk."""
    details, parents, _children = _plan_structures(plan)
    sp_ids = {
        i for i, blk in details.items()
        if blk.split("\n", 1)[0].endswith("Exchange") and "SinglePartition" in blk
    }
    global_agg_ids = _global_agg_ids(details)

    def semantic_parent(nid: int, seen: frozenset = frozenset()) -> set[int]:
        out: set[int] = set()
        for p in parents.get(nid, set()):
            if p in seen:
                continue
            name = details.get(p, "").split("\n", 1)[0]
            if any(name.startswith(w) for w in _TREE_WRAPPERS):
                out |= semantic_parent(p, seen | {nid})
            else:
                out.add(p)
        return out

    licensed = 0
    for e in sp_ids:
        sem = semantic_parent(e)
        if sem and sem <= global_agg_ids:
            licensed += 1
    return len(sp_ids), licensed


def nlj_scalar_license(plan: str) -> tuple[int, int]:
    """Round-13 scalar-broadcast license tier for nested-loop joins: a
    ``BroadcastNestedLoopJoin``/``CartesianProduct`` is benign iff one of
    its input subtrees PROVABLY produces at most one row — a path of
    unary, non-row-expanding nodes (no ``Generate``/``Expand``) down to a
    global aggregate (``Keys: []``). That is exactly the
    ``crossJoin(broadcast(df.agg(...)))`` scalar-bounds/totals idiom
    (``functions/rankstats.py``); a genuine data×data cartesian has no
    1-row side and still flags ``??``. Returns ``(n_nlj, n_licensed)``."""
    details, _parents, children = _plan_structures(plan)
    global_agg_ids = _global_agg_ids(details)
    nlj_ids = {
        i for i, blk in details.items()
        if blk.split("\n", 1)[0].startswith(
            ("BroadcastNestedLoopJoin", "CartesianProduct")
        )
    }

    def proves_scalar(nid: int, depth: int = 0) -> bool:
        if depth > 64:
            return False
        if nid in global_agg_ids:
            return True
        name = details.get(nid, "").split("\n", 1)[0]
        if name.startswith(("Generate", "Expand")):
            return False
        kids = children.get(nid, set())
        if name.startswith("AdaptiveSparkPlan"):
            # its "children" are the printed Final/Initial section roots —
            # alternative renderings of ONE plan, so any section proving
            # scalar proves the node (never a real binary operator)
            return any(proves_scalar(k, depth + 1) for k in kids)
        if len(kids) != 1:
            return False
        return proves_scalar(next(iter(kids)), depth + 1)

    licensed = sum(
        1
        for j in nlj_ids
        if any(proves_scalar(k) for k in children.get(j, set()))
    )
    return len(nlj_ids), licensed


#: Queries whose NON-aggregate single-partition exchanges are DOCUMENTED
#: as bounded — they move metadata-sized frames (the hypothesis-level BH
#: ranking, per-candidate ROC sweep, 6-row funnel lag window, day-level
#: rolling window, bucket-summary prefix sums), never data-sized rows.
#: Exchanges feeding global aggregates are licensed STRUCTURALLY by
#: sp_exchange_license; everything else must be listed here or it flags.
BOUNDED_SINGLE_PARTITION: dict[str, tuple[int, str]] = {
    # global BH rank window over one row per hypothesis (stats.py:
    # sabha_select_df docstring)
    "sabha_adjusted_selection": (2, "hypothesis-frame ranking"),
    # round 10: same hypothesis-frame global ranking (storey_select_df)
    "storey_fdr_selection": (2, "hypothesis-frame ranking"),
    # cumulative FP/FN sweep window over one row per distinct score
    # (stats.py:roc_optimal_cutoff_df docstring)
    "roc_optimal_cutoff": (1, "per-candidate ROC sweep"),
    # the 6-row funnel lag window (stage aggs are structurally licensed)
    "corpus_e2e_filter": (1, "6-row funnel lag window"),
    # rolling frame over the day-level aggregate (~2.4k calendar rows)
    "rolling_7day_revenue": (1, "day-level rolling window"),
    # prefix-sum offsets over the bucket-summary frame (n_keys/bucket_width
    # rows — the two-phase decomposition's whole point)
    "packed_token_sequences": (1, "bucket-summary offset window"),
    # round 14: same bucket-summary offset window over the id-div-1024
    # bucket frame (queries/multimodal_funnel.py:q_wds_shard_compaction)
    "wds_shard_compaction": (1, "bucket-summary offset window"),
    # prefix-sum offsets over the 256-row md5-range bucket summary
    # (sampling.py:epoch_shuffle docstring)
    "epoch_shuffle_documents": (1, "256-row bucket offset window"),
    # cumulative window over the count-of-counts frame (bounded by the
    # number of DISTINCT per-key counts) + the top_k-row rank window after
    # TakeOrderedAndProject (quality.py:key_skew_report docstring)
    "key_skew_orders_custkey": (2, "count-of-counts cum + top-5 rank"),
    # corpus-level 512-bin histogram cum window + the 256-row epoch-shuffle
    # bucket offset window (both fixed-size summary frames)
    "corpus_e2e_training_prep": (2, "512-bin hist cum + bucket offsets"),
    # ordered windows over the ~|sources|-row per-source frame (rank +
    # prefix sum; sampling.py:token_budget_waterfill docstring)
    "token_budget_waterfill": (2, "sources-frame waterfill windows"),
    # round 14: same waterfill closed form over the 7-row host frame
    # (queries/crawl_funnel.py:q_frontier_host_budget docstring)
    "frontier_host_budget": (2, "host-frame waterfill windows"),
    # round 14: waterfill windows over the host frame + the 4-row funnel
    # lag window (queries/crawl_funnel.py:q_crawl_budgeted_funnel)
    "crawl_budgeted_funnel": (3, "host-frame waterfill + funnel lag windows"),
    # round 15: same waterfill windows over the 7-row host frame feeding
    # the per-host top-k (queries/crawl_funnel.py:q_frontier_recrawl_schedule)
    "frontier_recrawl_schedule": (2, "host-frame waterfill windows"),
    # round 15: the 8-row stacked funnel lag window (stage indicators are
    # one global agg, structurally licensed)
    "multimodal_av_curation_funnel": (1, "8-row funnel lag window"),
    # calendar-bounded day-frame rolling window (same class as
    # rolling_7day_revenue)
    "daily_revenue_anomalies": (1, "day-frame rolling window"),
    # 1024-row bucket-offset window of the spend rank prefix sum (the
    # NTILE-free decile rewrite, relational2.py:q_revenue_pareto_deciles)
    "revenue_pareto_deciles": (1, "1024-row rank-bucket offset window"),
    # two exact-kth selections, each with a bucket-summary cum window plus
    # an in-bucket value-level cum window (both bounded: ~n_buckets rows /
    # <= bucket_width distinct values; quality.py:exact_kth_cents docstring)
    "winsorized_mean_extendedprice": (4, "bucket + in-bucket kth windows"),
    # 1024-row bucket-summary offset window of the two-phase rank prefix
    # sum (functions/rankstats.py:ranked_value_counts docstring)
    "mann_whitney_click_vs_view": (1, "1024-row rank-bucket offset window"),
    "kruskal_wallis_value_by_type": (1, "1024-row rank-bucket offset window"),
    # suffix/cumulative windows over the day-level KM summary frame
    # (bounded by the observation span; operators/survival.py docstring)
    "kaplan_meier_signup_to_purchase": (2, "day-frame KM windows"),
    # one 1024-row bucket-offset window per ranked axis (x and y)
    "spearman_price_vs_date": (2, "rank-bucket offset windows (x, y)"),
    # 1024-row bucket-offset window of the grouped-CDF prefix sum
    "ks_test_click_vs_view": (3, "1024-row CDF-bucket offset window, printed per consumer (ReuseExchange-deduped at runtime; round 11)"),
    # 1024-row bucket-offset window of the spend rank prefix sum
    "gini_customer_spend": (1, "1024-row rank-bucket offset window"),
    # cumulative window over the calendar-bounded day frame
    "cusum_changepoint_revenue": (1, "day-frame cumulative window"),
    # 1024-row bucket-offset window of the |d| rank prefix sum
    "wilcoxon_signed_rank_spend_halves": (1, "1024-row rank-bucket offset window"),
    # 1024-row bucket-offset window of the grouped-CDF prefix sum (CvM)
    "cvm_test_click_vs_view": (3, "1024-row CDF-bucket offset window, printed per consumer (ReuseExchange-deduped at runtime; round 11)"),
    # 1024-row bucket-offset window of the score rank prefix sum (AUC)
    "exact_auc_purchase_value": (1, "1024-row rank-bucket offset window"),
    # prefix-sum offsets over the bucket-summary frame of the packing
    # decomposition (same license class as packed_token_sequences)
    "training_shard_manifest": (1, "bucket-summary offset window"),
    # one 1024-row rank-bucket offset window per RFM axis
    "rfm_segments_purchases": (3, "1024-row rank-bucket offset windows (r, f, m)"),
    # 10-point prefix cumulation of the Heaps bucket frame
    "heaps_law_fit_documents": (1, "10-point prefix cumulation"),
    # per-segment CUSUM cumulative windows over the calendar-bounded day
    # frame (left/right children; the full segment is agg-licensed)
    "binary_segmentation_revenue": (2, "day-frame CUSUM cumulative windows"),
    # calibration-residual rank window over the day-frame count-of-counts
    "conformal_interval_daily_revenue": (1, "day-frame residual rank window"),
    # KM suffix/cumulative + step-lead windows over the day-level frame
    "rmst_signup_to_purchase": (1, "day-frame KM + lead windows"),
    # 1024-row bucket-offset window of the score-CDF prefix sum
    "score_separation_ks": (3, "1024-row CDF-bucket offset window, printed per consumer (ReuseExchange-deduped at runtime; round 11)"),
    # 1024-row rank-bucket offset window + the 10-row decile cum window
    "gains_table_quality_scores": (2, "1024-row rank-bucket offset + 10-row decile cum"),
    # 1024-row bucket-offset window of the value rank prefix sum (same
    # class as mann_whitney_click_vs_view; functions/rankstats.py:1569)
    "rank_biserial_click_vs_view": (1, "1024-row rank-bucket offset window"),
    # global-ordered suffix/cumulative windows over the day-level NA
    # summary frame (same class as kaplan_meier_signup_to_purchase;
    # operators/survival.py:236-241)
    "nelson_aalen_signup_to_purchase": (2, "day-frame NA suffix/cum windows"),
    # round 7: 1024-row bucket-offset windows of the two-phase CDF/rank
    # prefix sums (same class as ks/cvm/mann_whitney; rankstats docstrings)
    "wasserstein_click_vs_view": (1, "1024-row CDF-bucket offset window"),
    "ad_test_click_vs_view": (1, "1024-row CDF-bucket offset window"),
    "jonckheere_price_by_priority": (1, "1024-row multi-column CDF-bucket offset window"),
    # pooled-median location via ranked_value_counts (same 1024-row class)
    "mood_median_value_by_type": (1, "1024-row rank-bucket offset window"),
    # centered 7-day rolling window over the calendar-bounded day frame
    # (same class as daily_revenue_anomalies)
    "stl_lite_daily_revenue": (1, "day-frame rolling window"),
    # day-frame median rank window + day-ordered lag window (both
    # calendar-bounded; operators/events_analytics.py:runs_test_daily)
    "runs_test_daily_revenue": (2, "day-frame rank + lag windows"),
    # 1024-row bucket-offset window of the pooled rank prefix sum (same
    # class as kruskal_wallis_value_by_type; rankstats.dunn_test)
    "dunn_posthoc_value_by_type": (1, "1024-row rank-bucket offset window"),
    # round 8: calendar-bounded day-frame windows (rank + day-ordered
    # prefix/row_number; events_analytics.pettitt_change_point docstring —
    # same class as runs_test_daily_revenue)
    "pettitt_change_daily_revenue": (2, "day-frame rank + prefix windows"),
    # day-ordered row_number window over the day frame (cox_stuart_trend)
    "cox_stuart_daily_revenue": (2, "day-frame index windows"),
    # 1024-row bucket-offset window of the grouped-CDF prefix sum (same
    # class as ks/cvm/wasserstein; rankstats.cliff_delta docstring)
    "cliff_delta_click_vs_rest": (1, "1024-row CDF-bucket offset window"),
    # 1024-row bucket-offset window of the value rank prefix sum (same
    # class as mann_whitney; rankstats.ansari_bradley_test docstring)
    "ansari_bradley_click_vs_rest": (1, "1024-row rank-bucket offset window"),
    # 1024-row bucket-offset window of the block-range rank prefix sum
    # (rankstats.quade_test weights; same class as mann_whitney)
    "quade_value_by_type_blocks": (1, "1024-row rank-bucket offset window"),
    # round 9: 1024-row bucket-offset windows of the grouped-CDF prefix
    # sum (same class as ks/cvm/ad_test; rankstats.brunner_munzel_test and
    # rankstats.ad_two_sample_right docstrings)
    "brunner_munzel_click_vs_rest": (3, "1024-row CDF-bucket offset window, printed per consumer (ReuseExchange-deduped at runtime; round 11)"),
    "anderson_darling_click_vs_rest": (3, "1024-row CDF-bucket offset window, printed per consumer (ReuseExchange-deduped at runtime; round 11)"),
    # pooled deviation-rank prefix sum (same 1024-row class; group medians
    # ride group-KEYED windows which need no license —
    # rankstats.fligner_killeen_test docstring)
    "fligner_killeen_price_by_priority": (1, "1024-row rank-bucket offset window"),
    # centered 7-day rolling window over the calendar-bounded day frame
    # (same class as stl_lite_daily_revenue; shared _stl_micro_daily)
    "stl_strength_daily_revenue": (1, "day-frame rolling window"),
    # 1024-row bucket-offset windows (same class as ansari/ks;
    # rankstats.mood_scale_test / kuiper_two_sample docstrings)
    "mood_scale_click_vs_rest": (1, "1024-row rank-bucket offset window"),
    "kuiper_click_vs_rest": (3, "1024-row CDF-bucket offset window, printed per consumer (ReuseExchange-deduped at runtime; round 11)"),
    "quantile_shift_click_vs_rest": (3, "1024-row CDF-bucket offset window, printed per consumer (ReuseExchange-deduped at runtime; round 11)"),
    # composes mann_whitney + ansari: one 1024-row rank-bucket window per
    # component collapses to a single licensed exchange in the fused plan
    "lepage_click_vs_rest": (3, "1024-row rank/CDF-bucket offset windows, printed per consumer (ReuseExchange-deduped at runtime; round 11)"),
    # round 10: nine members over ONE shared CDF frame — the shared
    # 1024-row bucket-offset window prints in the cache-fill subtree and
    # once more for the eager count (rankstats.distribution_drift_panel)
    "distribution_drift_panel_events": (2, "shared 1024-row CDF-bucket offset window"),
    # pooled distinct-value cumulative via ranked_value_counts (same
    # 1024-row class; the per-group cumulatives are group-KEYED windows
    # which need no license — rankstats.ks_vs_rest_by_group docstring)
    "ks_drift_by_source": (1, "1024-row pooled-CDF bucket offset window"),
    # round 11: per-slice panel over the shared group-vs-rest grid — the
    # pooled cumulative's 1024-row bucket offset window (the per-group
    # cumulatives and every member statistic ride g-KEYED windows/aggs,
    # no license needed — rankstats._group_vs_rest_grid docstring)
    "drift_panel_by_source": (3, "1024-row pooled-CDF bucket offset window, printed per consumer pass (fused agg + BM + decile explode; cache/ReuseExchange-deduped at runtime)"),
    # the data card embeds ks_vs_rest_by_group — same pooled 1024-row
    # offset window class (round 11)
    "corpus_data_card": (2, "1024-row pooled-CDF bucket offset window (embedded KS-vs-rest component)"),
}

#: Nested-loop joins whose broadcast side is NOT provably 1-row (the
#: structural scalar tier in nlj_scalar_license) but is DOCUMENTED bounded
#: by a config-like cardinality — today only the group-vs-rest grid
#: construction, which cross-joins the pooled distinct-value frame with the
#: |groups| frame (functions/rankstats.py:_group_vs_rest_grid; groups are a
#: slicing dimension, never data-grain). Everything else must prove scalar
#: or it flags ``??``. Counts are per printed AQE section (final+initial),
#: matching how the audit counts nested_loop ids.
BOUNDED_NESTED_LOOP: dict[str, tuple[int, str]] = {
    # group-vs-rest grid construction: pooled distinct-value frame ×
    # |groups| frame (functions/rankstats.py:_group_vs_rest_grid)
    "drift_panel_by_source": (2, "groups-frame grid fan-out (|groups| rows)"),
    "ks_drift_by_source": (1, "groups-frame grid fan-out (|groups| rows)"),
    "corpus_data_card": (1, "groups-frame grid fan-out (embedded KS-vs-rest)"),
    "distribution_drift_panel_events": (1, "event-type-frame grid fan-out"),
    # day-frame pair statistics: calendar-bounded day aggregate crossed
    # with itself / its own summary (the documented all-pairs-on-days
    # designs: Kendall/Theil-Sen/Mann-Kendall/runs/segmentation)
    "mann_kendall_daily_revenue": (1, "day-frame pair cross (calendar-bounded)"),
    "mann_kendall_revenue_trend": (1, "day-frame pair cross (calendar-bounded)"),
    "kendall_tau_daily_orders": (1, "day-frame pair cross (calendar-bounded)"),
    "gk_gamma_daily_orders": (1, "day-frame pair cross (calendar-bounded)"),
    "theil_sen_daily_trend": (1, "day-frame pair cross (calendar-bounded)"),
    "runs_test_daily_revenue": (1, "day-frame vs day-summary cross"),
    "binary_segmentation_revenue": (4, "day-frame segment crosses (calendar-bounded)"),
    # keyed bounded-dimension frames crossed for pairwise/contingency
    # composition (|groups|^2-class, groups are slicing dimensions)
    "tukey_hsd_price_by_priority": (1, "priority-group frame pair cross"),
    "dunn_posthoc_value_by_type": (1, "event-type-group frame pair cross"),
    "mood_median_value_by_type": (1, "pooled-median (cached scalar) broadcast"),
    "source_centroid_similarity": (1, "per-source centroid frame pair cross"),
    "t_closeness_customers": (1, "attribute-class distribution frame cross"),
    "logrank_error_vs_clean": (1, "two-group day-frame survival cross"),
    "chi_square_type_dow": (1, "type x dow marginal frames cross (35 cells)"),
    "cramers_v_type_dow": (1, "type x dow marginal frames cross (35 cells)"),
    "als_block_recommender_events": (1, "fixed-rank factor block cross"),
    "als_implicit_block_recommender_events": (1, "fixed-rank factor block cross"),
    # similarity/retrieval: a FILTERED benchmark/query set (fixture
    # predicate, tens of rows) broadcast against the corpus — the
    # documented brute-force baseline / eval-panel shape; the scale path
    # is the IVF/LSH bucketed variant
    "embedding_knn_topk": (1, "query-set broadcast brute-force baseline"),
    "embedding_sq8_topk": (1, "query-set broadcast (SQ8 rerank baseline)"),
    "embedding_ivf_nprobe2": (1, "query-set x cached centroid table"),
    "ann_recall_ivf_vs_exact": (2, "query-set broadcast (exact baseline arm)"),
    "retrieval_mrr_ndcg_ivf": (2, "query-set broadcast (exact baseline arm)"),
    "retrieval_rbo_ivf": (1, "query-set broadcast (exact baseline arm)"),
    "mmr_diversified_top3": (1, "query-set broadcast (MMR candidate pool)"),
    "contrastive_pairs_panel": (1, "eval-panel broadcast vs corpus"),
    "semantic_contamination_flags": (1, "benchmark-panel broadcast vs corpus"),
}

#: Single-partition licenses whose bound SCALES WITH A TABLE GRAIN (rows of
#: a data table, not a fixed bucket/day/bin count). These print
#: ``?? data-grain`` — a warning, never ``ok`` — so the zero-unbounded
#: invariant the audit enforces stays meaningful. Kept EMPTY by design:
#: an entry here is a known scale defect awaiting the bucketed-prefix-sum
#: (or histogram-cut) rewrite, not an accepted license. (The last entry,
#: revenue_pareto_deciles' customer-grain ntile, was rewritten onto
#: rankstats.ranked_value_counts in round 5.)
DATA_GRAIN_SINGLE_PARTITION: dict[str, tuple[int, str]] = {}


def main() -> None:
    import __spark_entry__ as entrymod
    from azure_medicine_data_engineering_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("explain-audit", master="local[8]", conf={"spark.ui.enabled": "false"})
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
        except Exception as e:
            print(f"{name}: BUILD ERROR {e}")
            continue
        plan = plan_of(df)
        # release this query's stage caches BEFORE auditing the next one:
        # an eagerly materialized cache (e.g. the drift panel's shared CDF
        # frame) otherwise substitutes into later queries' canonically
        # equal subtrees and rewrites THEIR plans mid-session (observed:
        # the cdf-family standalones flagging phantom SP exchanges)
        for c in getattr(df, "_stage_caches", None) or []:
            c.unpersist()
        info = audit(name, plan)
        flags = []
        if info["single_partition"]:
            n_sp, n_licensed = sp_exchange_license(plan)
            bound, why = BOUNDED_SINGLE_PARTITION.get(name, (0, ""))
            dg_bound, dg_why = DATA_GRAIN_SINGLE_PARTITION.get(name, (0, ""))
            unlicensed = n_sp - n_licensed
            if n_licensed:
                flags.append(f"ok {n_licensed} sp->global-agg")
            if unlicensed == 0:
                pass
            elif unlicensed <= bound:
                flags.append(f"ok {unlicensed} bounded single-partition ({why})")
            elif unlicensed <= bound + dg_bound:
                # data-grain licenses warn — the bound scales with a table,
                # so the plan is a known 100x scale defect, not accepted
                flags.append(
                    f"?? {unlicensed - bound} data-grain single-partition ({dg_why})"
                )
            else:
                flags.append(
                    f"!! {unlicensed} unlicensed single-partition exchange"
                )
        if info["nested_loop"]:
            n_nlj, n_scalar = nlj_scalar_license(plan)
            nb, nb_why = BOUNDED_NESTED_LOOP.get(name, (0, ""))
            if n_scalar:
                flags.append(f"ok {n_scalar} scalar-broadcast nlj")
            rest = n_nlj - n_scalar
            if rest > 0 and rest <= nb:
                flags.append(f"ok {rest} bounded nested-loop ({nb_why})")
            elif rest > 0:
                flags.append(f"?? {rest} nested-loop/cartesian")
        print(f"{name}: {info} {' '.join(flags)}")
    spark.stop()


if __name__ == "__main__":
    main()
