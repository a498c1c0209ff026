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


def audit(name: str, plan: str) -> dict:
    return {
        "exchanges": _count_unique(plan, r"\bExchange\b"),
        # formatted explain puts partitioning in the details section;
        # grand-total (1-row) aggregates legitimately show one of these.
        "single_partition": len(re.findall(r"Arguments: SinglePartition", plan)),
        "broadcast_joins": _count_unique(plan, r"BroadcastHashJoin"),
        "sortmerge_joins": _count_unique(plan, r"SortMergeJoin"),
        "nested_loop": _count_unique(plan, r"BroadcastNestedLoopJoin|CartesianProduct"),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "scans": _count_unique(plan, r"Scan parquet"),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "read_cols": [
            len(s.split(",")) for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        ],
    }


#: Queries whose single-partition exchanges are DOCUMENTED as bounded —
#: they move metadata-sized frames (grand-total aggregate rows, the
#: hypothesis-level BH ranking, per-candidate ROC sweep, 6-row funnel
#: reports), never data-sized rows. Kept explicit so a new unbounded
#: single-partition shuffle in these queries still raises the count above
#: the recorded bound and flags.
BOUNDED_SINGLE_PARTITION: dict[str, tuple[int, str]] = {
    # global BH rank + count over one row per hypothesis (stats.py:
    # sabha_select_df docstring)
    "sabha_adjusted_selection": (2, "hypothesis-frame ranking"),
    # cumulative FP/FN sweep over one row per distinct score
    # (stats.py:roc_optimal_cutoff_df docstring)
    "roc_optimal_cutoff": (1, "per-candidate ROC sweep"),
    # six 1-row stage aggregates + the 6-row funnel lag window
    "corpus_e2e_filter": (7, "1-row stage aggs + 6-row funnel window"),
    # rolling frame over the day-level aggregate (~2.4k calendar rows)
    "rolling_7day_revenue": (1, "day-level rolling window"),
    # the grand-total token count feeding the vocabulary broadcast
    "unigram_logprob_quality": (1, "1-row corpus-total aggregate"),
    # prefix-sum offsets over the bucket-summary frame (n_keys/bucket_width
    # rows — the two-phase decomposition's whole point)
    "packed_token_sequences": (1, "bucket-summary offset window"),
}


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
        info = audit(name, plan)
        flags = []
        if info["single_partition"]:
            bound, why = BOUNDED_SINGLE_PARTITION.get(name, (0, ""))
            # a SinglePartition exchange feeding a GLOBAL aggregate
            # (grouping Keys: []) moves partial-agg rows — one per upstream
            # partition — not data; classify automatically. Only the
            # detail section prints 'Keys:', and a global agg is a
            # partial+final pair, so 2 'Keys: []' lines license one
            # benign exchange.
            n_global_aggs = len(re.findall(r"Keys: \[\]", plan)) // 2
            bound = max(bound, n_global_aggs)
            if why == "" and n_global_aggs:
                why = "grand-total aggregate"
            if info["single_partition"] <= bound:
                flags.append(
                    f"ok {info['single_partition']} bounded single-partition ({why})"
                )
            else:
                flags.append(
                    f"!! {info['single_partition']} single-partition exchange"
                )
        if info["nested_loop"]:
            flags.append(f"?? {info['nested_loop']} nested-loop/cartesian")
        print(f"{name}: {info} {' '.join(flags)}")
    spark.stop()


if __name__ == "__main__":
    main()
