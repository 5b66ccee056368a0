"""Physical-plan audit over the whole registry.

For every queries() entry, plans (does NOT execute) the DataFrame at
the given sf dir and reports the scale-relevant plan features:

- exchanges (hash / range / single-partition) — the shuffle count,
- broadcast exchanges / broadcast joins — small sides actually hinted,
- whole-stage-codegen span count — how much stays in generated JVM code,
- Python boundaries (mapInPandas / ArrowEvalPython etc.) — the
  deliberate Arrow-batched sites, which should match the documented
  list (GEMM, codec, stateful streaming),
- sort-merge joins and global sorts — expensive shapes worth eyeballing.

Writes PLANS.md (markdown table, one row per query) so plan regressions
are reviewable in diffs; tests pin hard limits for the queries whose
docstrings promise a shape (tests/test_queries_round3.TestPlanShapes).

Usage: python tools/plan_report.py [sf_dir]   (default sf0.001;
streaming drain queries are planned via their batch oracle twin shape
and marked 'streaming').
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instacart_medallion_lakehouse_spark import queries as q  # noqa: E402
from instacart_medallion_lakehouse_spark.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _uniq_exchanges(pattern: str, plan: str) -> int:
    """Count DISTINCT exchanges matching ``pattern``.

    A cached (InMemoryRelation) subtree is printed once per consumer,
    so counting raw occurrences over-reports every exchange beneath a
    cache by its consumer count — e.g. lm_perplexity's 4 runtime
    shuffles printed as 7. Exchange lines carry a stable [plan_id=N];
    deduplicating on it counts each physical exchange once (falls back
    to occurrence count for plans without plan_id annotations).
    """
    ids = re.findall(pattern + r"[^\n]*\[plan_id=(\d+)\]", plan)
    return len(set(ids)) if ids else len(re.findall(pattern, plan))


def audit(plan: str) -> dict:
    return {
        "shuffles": _uniq_exchanges(
            r"Exchange (?:hash|range)partitioning", plan
        ),
        "single_part": _uniq_exchanges(r"Exchange SinglePartition", plan),
        "broadcasts": _uniq_exchanges(r"BroadcastExchange", plan),
        # executedPlan().toString() marks codegen'd operators "*(n) Op";
        # count distinct span ids n
        "wscg": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python": len(
            re.findall(
                r"MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas|PythonMapInArrow",
                plan,
            )
        ),
        "smj": plan.count("SortMergeJoin"),
        "global_sort": len(
            re.findall(r"Sort \[[^\]]*\], true", plan)
        ),  # third arg true = global
    }


def main() -> None:
    spark = build_session("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    # AQE defers physical finalization (incl. codegen annotation) to
    # runtime; the audit wants the static plan with *(n) span markers.
    # Exchange/broadcast counts are unaffected (AQE coalesces partition
    # counts, it does not remove planned exchanges).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rows = []
    for name, fn in q.queries().items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            info = audit(plan)
            streaming = df.isStreaming if hasattr(df, "isStreaming") else False
            rows.append((name, info, "streaming" if streaming else ""))
        except Exception as e:  # planning must never crash the report
            rows.append((name, None, f"ERROR {type(e).__name__}: {e}"[:80]))
    lines = [
        "# PLANS — physical-plan audit of every registry query",
        "",
        f"Planned (not executed) against `{SF_DIR}` on the tuned session.",
        "Columns: shuffles = hash/range exchanges; 1p = single-partition",
        "exchanges (final global rollups); bcast = broadcast exchanges;",
        "wscg = whole-stage-codegen spans; py = Arrow/Python boundaries",
        "(only the documented GEMM/codec/stateful sites should be nonzero);",
        "smj = sort-merge joins; gsort = global sorts.",
        "",
        "| query | shuffles | 1p | bcast | wscg | py | smj | gsort | note |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, info, note in rows:
        if info is None:
            lines.append(f"| {name} | — | — | — | — | — | — | — | {note} |")
        else:
            lines.append(
                f"| {name} | {info['shuffles']} | {info['single_part']} "
                f"| {info['broadcasts']} | {info['wscg']} | {info['python']} "
                f"| {info['smj']} | {info['global_sort']} | {note} |"
            )
    py_total = sum(i["python"] for _, i, _ in rows if i)
    lines += [
        "",
        f"Totals: {len(rows)} queries; {py_total} Python/Arrow boundaries "
        "across the registry (GEMM / media codec / stateful streaming only).",
    ]
    with open(os.path.join(HERE, "PLANS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote PLANS.md ({len(rows)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
