"""Per-query physical-plan census → SCALE_AUDIT.md.

Complements tests/test_plan_quality.py::test_catalog_wide_plan_hygiene
(which FAILS on anti-patterns): this tool REPORTS the plan shape of
every registry query so scale reviews and round-over-round diffs read
one table instead of 192 `.explain()` dumps.

Columns:

* exch      — shuffle Exchanges (hash/range), the real scale currency;
* 1part     — `Exchange SinglePartition` count. Non-zero is NOT an
  anti-pattern by itself: every global one-row aggregate (grand totals,
  normalizers, bounds) and every bounded-grain window (day spine,
  deciles, two-phase shard offsets) funnels through one; the hygiene
  test plus per-query docstrings own the bounded-grain argument;
* bcast     — broadcast exchanges (dims, spines, one-row totals);
* win       — window operators;
* arrow     — Arrow-batched Python stages (documented codec/GEMM/BPE
  queries only — the hygiene test enforces the allowlist);
* wscg      — WholeStageCodegen spans (bigger spans = more of the plan
  fused into generated JVM code).

Usage: python tools/scale_audit.py [sf_dir] > SCALE_AUDIT.md
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from superstore_data_pipeline_analytics_dashboard__spark.plans.catalog_queries import (  # noqa: E501
    QUERIES,
)
from superstore_data_pipeline_analytics_dashboard__spark.session import (
    get_spark,
)


def _decompose(plan: str) -> tuple[str, dict[str, str]]:
    """Split a plan string into (outer text, {normalized: text} of DISTINCT
    cached subtrees). `InMemoryRelation` prints its full cached plan once
    PER SCAN occurrence, so a persisted frame with 4 consumers shows its
    upstream exchanges 4x in the raw string even though they execute
    exactly once — q88's triangle DAG censused at 228 raw exchanges vs
    ~12 executed. Counting each distinct cached subtree once (dedup on
    the expr-id-normalized text; nested cached subtrees recurse) makes
    the census reflect what actually runs.

    Known limitation: the dedup key is expr-id-normalized TEXT, so two
    genuinely distinct persisted relations with isomorphic plans census
    as one (undercount). Mostly benign — CacheManager itself dedups
    sameResult plans, so isomorphic cached builds over the same source
    normally ARE one cache entry — but it means this census cannot
    distinguish one shared build from two identical per-tier builds;
    pins that need that distinction (q243's one-tokenize pin) must
    clear the cache first so only the query's own entries exist."""
    lines = plan.split("\n")

    def depth(line: str) -> int:
        m = re.search(r"[+:]- ", line)
        return m.start() if m else -1

    outer: list[str] = []
    blocks: dict[str, str] = {}
    i = 0
    while i < len(lines):
        line = lines[i]
        if "InMemoryRelation" in line:
            outer.append(line)  # the relation line itself carries no ops
            d = depth(line)
            j = i + 1
            while j < len(lines) and depth(lines[j]) > d:
                j += 1
            sub_outer, sub_blocks = _decompose("\n".join(lines[i + 1 : j]))
            # dedup key: strip expr ids AND the per-position tree
            # indentation — the same cached relation prints at different
            # depths under each consumer
            key = re.sub(
                r"#\d+",
                "#x",
                "\n".join(
                    re.sub(r"^[\s:+\-|]*", "", ln)
                    for ln in sub_outer.split("\n")
                ),
            )
            blocks[key] = sub_outer
            blocks.update(sub_blocks)
            i = j
        else:
            outer.append(line)
            i += 1
    return "\n".join(outer), blocks


def census(raw: str) -> dict[str, int]:
    # Refuse AQE-materialized plan text: once a cached AdaptiveSparkPlan
    # is isFinalPlan=true, toString prints BOTH "== Final Plan ==" and
    # "== Initial Plan ==" sections PER SCAN occurrence, and the section
    # bodies drop the tree markers _decompose scopes by — q108 censused
    # at 80 Exchanges this way when its AQE-off plan has 9. The census
    # session must run with spark.sql.adaptive.enabled=false (main()
    # does); plan-shape tests that reuse _decompose stay on lazy
    # (never-materialized) caches, which print marker-safe trees.
    if "== Initial Plan ==" in raw or "== Final Plan ==" in raw:
        raise ValueError(
            "census() received AQE-materialized plan text (Final/Initial "
            "sections re-print per cache scan and defeat the subtree "
            "dedup); disable AQE in the census session"
        )
    outer, cached = _decompose(raw)
    plan = "\n".join([outer, *cached.values()])
    return {
        "exch": len(re.findall(r"\bExchange (?:hash|range)partitioning", plan)),
        "1part": len(re.findall(r"\bExchange SinglePartition", plan)),
        "bcast": len(re.findall(r"\bBroadcastExchange\b", plan)),
        "win": len(re.findall(r"\bWindow\b", plan)),
        "arrow": len(
            re.findall(
                r"\b(?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)\b",
                plan,
            )
        ),
        # Spark renders codegen stages as "*(n) Op" in executedPlan
        # toString (and "WholeStageCodegen (n)" in formatted mode)
        "wscg": len(
            set(re.findall(r"\*\((\d+)\)", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="scale-audit", shuffle_partitions=8)
    # AQE OFF for the census (execution semantics unchanged — AQE is a
    # runtime optimizer): (a) queries that materialize their caches while
    # being BUILT (q108's union-find collect, BPE/k-means iteration) make
    # every later cache scan re-print "== Final Plan ==" AND "== Initial
    # Plan ==" sections whose bodies _decompose cannot scope — q108
    # censused at 80 Exchanges vs its real 9; (b) runtime re-plans make
    # counts depend on observed sizes, so round-over-round diffs would
    # mix plan changes with AQE decisions. The static plan is the
    # deterministic design object this census exists to diff.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")
    print("# Scale audit — per-query physical-plan census")
    print()
    print(f"Generated by `python tools/scale_audit.py {sf_dir}`.")
    print("Column semantics in the tool's docstring; anti-patterns are")
    print("ENFORCED by tests/test_plan_quality.py, this is the census.")
    print("Counts are read from the pre-execution plan string with AQE")
    print("DISABLED in the census session: the static plan is the")
    print("deterministic design object (at runtime AQE may coalesce")
    print("partitions, split skew, or convert shuffles to broadcasts —")
    print("fewer exchanges than censused, never more), and AQE-")
    print("materialized caches re-print Final+Initial plan sections per")
    print("scan, which inflated eager composites ~10x (q108: 80 vs 9).")
    print("Cached (persisted) subtrees are counted ONCE per distinct")
    print("relation — `InMemoryRelation` re-prints its plan per scan, but")
    print("the subtree executes exactly once. (Distinctness is judged on")
    print("expr-id-normalized plan TEXT, so two separate persisted builds")
    print("with isomorphic plans census as one; CacheManager dedups")
    print("sameResult plans the same way, so the undercount is benign.)")
    print()
    print("| query | exch | 1part | bcast | win | arrow | wscg |")
    print("|---|---|---|---|---|---|---|")
    totals = {k: 0 for k in ("exch", "1part", "bcast", "win", "arrow", "wscg")}
    for name, fn in QUERIES.items():
        # order-independence: earlier queries persist frames, and
        # CacheManager substitutes sameResult cache entries into LATER
        # plans — without this, a registry reorder changes an untouched
        # query's censused counts (observed r9: q41 3 exch → 2 purely
        # from the rotation). Same hazard CLAUDE.md documents for
        # plan-shape tests.
        spark.catalog.clearCache()
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        c = census(plan)
        for k, v in c.items():
            totals[k] += v
        print(
            f"| {name} | {c['exch']} | {c['1part']} | {c['bcast']}"
            f" | {c['win']} | {c['arrow']} | {c['wscg']} |"
        )
    print(
        f"| **total ({len(QUERIES)} queries)** | {totals['exch']}"
        f" | {totals['1part']} | {totals['bcast']} | {totals['win']}"
        f" | {totals['arrow']} | {totals['wscg']} |"
    )
    print()
    print("Caveat: the checkpoint-resume and sink-building queries")
    print("(q251, q255-q258) do their real work EAGERLY inside the")
    print("builder (pagerank iterations, partition writes, erasure")
    print("rewrites) — the censused plan is only the final bounded")
    print("read/report, so near-zero counts there mean 'work happened")
    print("before the returned frame', not 'shuffle-free'. Their")
    print("operator cores' plan shapes are pinned in their own test")
    print("files (test_topk/test_checkpoint/test_snapshots).")


if __name__ == "__main__":
    main()
