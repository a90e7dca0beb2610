#!/usr/bin/env python
"""Plan audit: sweep EVERY registered query's optimized + physical plan
for scale anti-patterns and print a markdown report.

    python tools/plan_audit.py [--sf /root/testdata/sf0.01]

Flags raised:
- **CartesianProduct** anywhere (always a bug in this engine).
- **BroadcastNestedLoopJoin** outside the known-intentional list
  (tiny broadcast side under a non-equi condition — see PLANS.md).
- **BatchEvalPython** (row-at-a-time Python UDF — the slow path; only
  ArrowEvalPython / mapInPandas nodes are sanctioned).
- **Duplicated expensive folds**: more `aggregate(` occurrences in the
  optimized plan than the query legitimately contains — the
  projection-CSE / filter-on-alias traps (PLANS.md round-2 note).
  Threshold is generous (8); the trap produces 16-66 copies.
- **Giant literal expressions** (round-5 item 5a): any single optimized-
  plan line over MAX_PLAN_LINE chars — the inlined-literal-array pattern
  (Bloom bitmaps etc.). The sanctioned 4096-element bitmaps produce
  ~60k-char lines; the gate fires at ~2x that, before an unbounded
  collect-and-inline could ship a corpus into the plan.
- **Driver iteration counts** (item 5b): looping operators record their
  cluster-round counts in `atlassian_confluence_data_pipeline_spark.iterstats`;
  any query whose build drives an operator past ITERATION_BOUND rounds
  is flagged (loops must be configured constants or O(log n), never
  data-tracking).
- **Checkpoint counts** (item 5c): DISTINCT `Scan ExistingRDD` frames in
  the physical plan (localCheckpoint materializations feeding the final
  job) above CHECKPOINT_SCAN_BOUND — each is a full materialization of
  an intermediate; a plan accumulating many distinct ones is
  over-materializing. Re-scanning ONE checkpointed frame many times
  (unrolled iterations over a bounded matrix) is reuse, not waste, so
  scans of the same frame count once.

Exit code 1 if anything is flagged, so CI can gate on it.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from atlassian_confluence_data_pipeline_spark.plans import QUERIES  # noqa: E402
from atlassian_confluence_data_pipeline_spark.session import get_session  # noqa: E402

#: BNLJ nodes that are by design: tiny broadcast side, non-equi or
#: cross condition (documented in PLANS.md "Intentional BNLJ")
INTENTIONAL_BNLJ = {
    "cosine_topk",
    "ivf_ann_topk",
    "rich_inactive_customers",
    "bm25_topk",  # 1-row corpus-stats aggregate broadcast-crossed onto terms
    "nation_acctbal_share",  # 1-row global-balance scalar crossed onto 25 rows
    "source_js_divergence",  # 20-source dim crossed onto 50-term vocab (dense matrix)
    "join_key_skew_report",  # 1-row total-count scalar crossed onto top-20 keys
    "binned_quantile_estimates",  # 3-row (p, k) probe table broadcast under
    # a non-equi cum>=k condition onto the 256-bin / distinct-value cumsums
    "hll_distinct_orders",  # 1-row estimate x 1-row exact scalar attach
    "hll_merge_users",  # three 1-row scalar frames crossed into the report
    "kmv_intersection_users",  # four 1-row sketch-threshold scalars crossed
    "cusum_drift_daily_revenue",  # 1-row moment frame broadcast onto |days|
    "ab_test_value_ztest",  # two 1-row variant-moment frames crossed
    "dedup_method_agreement",  # three 1-row pair-count scalars crossed
    "conversion_latency_percentiles",  # 2-row probe table crossed onto
    # the distinct-latency cumsum (binned_quantile pattern)
    "customer_revenue_gini",  # 1-row top-decile scalar crossed
    "freshness_lag_report",  # 1-row stream-head scalar broadcast onto 5 groups
    "int8_topk_recall",  # 10-row broadcast query side under the != self
    # condition (cosine_topk pattern), twice (exact + quantized rankings)
    "acf_daily_revenue",  # 1-row global-moment frame crossed onto 14 lag rows
    "benford_price_audit",  # 1-row total-count scalar crossed onto <= 9 digits
    "session_funnel_patterns",  # 1-row total scalar crossed onto the
    # <= 5-row category rollup
    "ivf_recall_audit",  # 10-row broadcast query frame under the
    # query_id != neighbor_id condition (the cosine_topk brute-force side)
    "ndcg_label_retrieval",  # the same 10-row broadcast probe frame
    # under != (cosine_topk pattern), metric arithmetic on k rows/query
    "robust_trend_daily_revenue",  # pairwise-slope self-join of the
    # CALENDAR-BOUNDED day series (~2.4k rows broadcast under db > da;
    # Theil-Sen/Mann-Kendall are all-pairs by definition)
    "hodges_lehmann_daily_revenue",  # Walsh-average self-join of the
    # calendar-bounded day series under db >= da (the robust_trend
    # pattern; pseudomedian is all-pairs by definition)
    "burrows_delta_sources",  # |sources| x 30-marker-word grid built by
    # crossing the source totals with the TakeOrdered marker list —
    # both sides bounded (the zero-count cells must exist for z-scores)
}

#: queries whose plans legitimately carry many HOF folds (k parallel
#: aggregate expressions by construction, not accidental duplication)
MANY_FOLD_OK = {
    "minhash_lsh_pairs",  # k-slot signature fold + band folds
    "embedding_lsh_pairs",  # 64 running dots in one struct fold
    "ivf_ann_topk",  # cosine (dot + 2 norms) at 3 join sites + centroid mean
    "ivf_recall_audit",  # the ivf_ann_topk folds PLUS the brute-force
    # exact ranking's cosine folds (two complete rankings in one plan)
    "centroid_classifier_confusion",  # 10 centroid-distance folds (one
    # per label codebook entry) in the broadcast-codebook explode
    "centroid_silhouette_by_label",  # same 10-fold distance frame
}

FOLD_THRESHOLD = 8

#: queries whose physical plan contains an UNPARTITIONED window whose
#: input domain is provably BOUNDED (a constant independent of corpus
#: size: top-k limits, fixed bin/vocab counts, k-row merges) — the only
#: sanctioned use of the WindowExec single-partition path. Anything
#: windowing a domain that grows with the data must go through
#: operators/windows.py distributed_prefix_rank instead.
BOUNDED_GLOBAL_WINDOW_OK: dict[str, str] = {
    "binned_quantile_estimates": "cumsum over the fixed 256-bin histogram"
    " (the exact-audit branch uses distributed_prefix_rank)",
    "bpe_merge_candidates": "rank inside the 20-row TakeOrdered result",
    "rrf_hybrid_search": "ranks inside the two 100-row TakeOrdered cuts"
    " and the <=200-row fused frame",
    "weighted_sample_wor": "rank inside the K-row TakeOrdered sample",
    "zipf_slope": "rank inside the top-100 TakeOrdered vocabulary cut",
    "daily_revenue_locf": "LOCF carry over the calendar-day spine"
    " (~2.4k rows for the 7-year fixture — bounded by time span, not"
    " corpus size; revenue is pre-aggregated to the day domain)",
}

UNPARTITIONED_WINDOW_RE = None  # compiled lazily below


def _has_unpartitioned_window(phys: str) -> bool:
    """True if the physical plan contains a windowspecdefinition with NO
    partition columns (its first argument is an ORDER clause — bare
    attribute followed by ASC/DESC NULLS)."""
    global UNPARTITIONED_WINDOW_RE
    import re

    if UNPARTITIONED_WINDOW_RE is None:
        UNPARTITIONED_WINDOW_RE = re.compile(
            r"windowspecdefinition\([^,()]+ (?:ASC|DESC) NULLS"
        )
    return bool(UNPARTITIONED_WINDOW_RE.search(phys))


#: item 5a — longest tolerated optimized-plan line. The sanctioned
#: 4096-bit Bloom bitmap literals produce ~60k-char lines; anything
#: past 2x that means an unbounded collect was inlined into the plan.
MAX_PLAN_LINE = 120_000

#: item 5c — DISTINCT `Scan ExistingRDD` (localCheckpoint) frames
#: tolerated in one physical plan. The heaviest legitimate chains
#: (shared LSH stages + graph contraction) sit well below this.
CHECKPOINT_SCAN_BOUND = 12

_CKPT_RE = None


def _distinct_checkpoints(phys: str) -> int:
    global _CKPT_RE
    import re

    if _CKPT_RE is None:
        _CKPT_RE = re.compile(r"Scan ExistingRDD\[[^\]]*\]")
    # self-join re-references of ONE checkpoint get fresh attribute ids;
    # strip the #id suffixes so those dedupe to the frame's column shape
    return len({re.sub(r"#\d+", "", m) for m in _CKPT_RE.findall(phys)})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    from atlassian_confluence_data_pipeline_spark import iterstats

    spark = get_session("plan-audit", cpus=8)
    flagged: list[str] = []
    print(
        "| query | cartesian | BNLJ | py-udf | aggregate( count |"
        " 1p-window | maxline | iters | ckpts |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for name in sorted(QUERIES):
        iterstats.reset()
        try:
            df = QUERIES[name].fn(spark, args.sf)
            opt = df._jdf.queryExecution().optimizedPlan().toString()
            phys = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - audit robustness
            flagged.append(f"{name}: plan build failed: {e}")
            print(f"| {name} | ERROR | | | | | | | |")
            continue
        cartesian = "CartesianProduct" in phys or "Cross" in opt.split("\n")[0]
        bnlj = "BroadcastNestedLoopJoin" in phys
        pyudf = "BatchEvalPython" in phys
        folds = opt.count("aggregate(")
        gwin = _has_unpartitioned_window(phys)
        maxline = max((len(ln) for ln in opt.splitlines()), default=0)
        iters = iterstats.snapshot()
        worst_iter = max(iters.values(), default=0)
        ckpts = _distinct_checkpoints(phys)
        row_flags = []
        if cartesian:
            row_flags.append("cartesian product")
        if bnlj and name not in INTENTIONAL_BNLJ:
            row_flags.append("unexpected BNLJ")
        if pyudf:
            row_flags.append("row-at-a-time Python UDF")
        if folds > FOLD_THRESHOLD and name not in MANY_FOLD_OK:
            row_flags.append(f"{folds} aggregate-folds (CSE trap?)")
        if gwin and name not in BOUNDED_GLOBAL_WINDOW_OK:
            row_flags.append(
                "unpartitioned WindowExec over an unbounded domain"
                " (use distributed_prefix_rank, or allowlist with the"
                " bound if the domain is constant)"
            )
        if maxline > MAX_PLAN_LINE:
            row_flags.append(
                f"{maxline}-char plan line (inlined literal past the"
                f" {MAX_PLAN_LINE} gate — collect-and-inline of"
                " unbounded data?)"
            )
        if worst_iter > iterstats.ITERATION_BOUND:
            worst_op = max(iters, key=iters.get)
            row_flags.append(
                f"driver loop {worst_op} ran {worst_iter} rounds"
                f" (> {iterstats.ITERATION_BOUND})"
            )
        if ckpts > CHECKPOINT_SCAN_BOUND:
            row_flags.append(
                f"{ckpts} distinct checkpointed frames in one plan"
                f" (> {CHECKPOINT_SCAN_BOUND})"
            )
        for fl in row_flags:
            flagged.append(f"{name}: {fl}")
        print(
            f"| {name} | {'X' if cartesian else ''} |"
            f" {'X' if bnlj else ''} | {'X' if pyudf else ''} | {folds} |"
            f" {'X' if gwin else ''} | {maxline // 1000}k |"
            f" {worst_iter or ''} | {ckpts or ''} |"
        )
    print()
    if flagged:
        print("FLAGGED:")
        for f in flagged:
            print(" -", f)
        return 1
    print(f"OK: {len(QUERIES)} queries, nothing flagged.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
