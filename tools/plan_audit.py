"""Physical-plan audit: for every registered batch query, capture
``explain("formatted")`` and summarize the scale-relevant facts —
exchange (shuffle) count, join strategies, scan column pruning, pushed
filters, and whole-stage-codegen coverage — into PLANS.md.

Run: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_SUBSTR = ("stream",)  # streaming queries execute a writeStream, skip


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(plan: str) -> dict:
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "exchange_nodes": len(re.findall(r"\(\d+\) Exchange", plan)),
        "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "shj": len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"\(\d+\) CartesianProduct", plan)),
        "scan_cols": [len([c for c in s.split(",") if c]) for s in scans],
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "codegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "python_nodes": len(
            re.findall(r"\(\d+\) (?:MapInPandas|FlatMapGroupsInPandas|"
                       r"ArrowEvalPython|BatchEvalPython)", plan)
        ),
    }


# Wrapper nodes skipped when naming what a broadcast side actually IS.
_WRAPPERS = {
    "InputAdapter",
    "WholeStageCodegen",
    "ColumnarToRow",
    "Project",
    "Filter",
    "BroadcastExchange",
    "BroadcastQueryStage",
    "ShuffleQueryStage",
    "Exchange",
    "AQEShuffleRead",
    "Sort",
    "ReusedExchange",
}


def _rows(node):
    try:
        m = node.metrics()
        if m.contains("numOutputRows"):
            return int(m.apply("numOutputRows").value())
    except Exception:
        pass
    return None


def _tree(node):
    """Executed physical plan as a nested dict, descending through AQE
    stage wrappers so post-execution metrics are reachable."""
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        return _tree(node.executedPlan())
    if cls.endswith("QueryStageExec"):
        return _tree(node.plan())
    kids = [_tree(node.children().apply(i)) for i in range(node.children().size())]
    if cls == "ReusedExchangeExec":
        kids = [_tree(node.child())]
    return {"name": node.nodeName(), "rows": _rows(node), "children": kids}


def _find(t, pred):
    if pred(t):
        return t
    for c in t["children"]:
        hit = _find(c, pred)
        if hit is not None:
            return hit
    return None


def _describe(t):
    """First non-wrapper descendant name — what the relation actually is."""
    base = t["name"].split(" (")[0].strip()
    if base not in _WRAPPERS:
        return base
    for c in t["children"]:
        d = _describe(c)
        if d:
            return d
    return base


def _first_rows(t):
    if t["rows"] is not None:
        return t["rows"]
    for c in t["children"]:
        r = _first_rows(c)
        if r is not None:
            return r
    return None


# A "bounded" nested-loop side at sf0.01 (5k docs / 60k orders / 600k
# lineitem): anything materially above this is corpus-scaled, not a
# constant/aggregate/candidate set, and must be treated as a bug.
BOUNDED_ROWS = 5_000


def cartesian_evidence(name: str, df) -> list[str]:
    """Execute the query and, for every nested-loop/cartesian node in the
    FINAL (post-AQE) plan, name the bounded side with its OBSERVED row
    count — the per-flag adjudication PLANS.md records (a flag whose
    bounded side can't be named, or isn't bounded, is a bug, not a
    note)."""
    ep = df._jdf.queryExecution().executedPlan()
    # execute THIS QueryExecution (so its metrics populate) without a
    # driver-side collect of the result rows: RDD count is distributed
    ep.execute().count()
    t = _tree(ep)
    out = []

    def top_exchange(child):
        # the BUILD side's subtree STARTS with the broadcast exchange
        # (through pass-through wrappers only) — searching anywhere would
        # wrongly match broadcast joins nested inside the STREAM side
        t = child
        while True:
            base = t["name"].split(" (")[0].strip()
            if base in ("BroadcastExchange", "BroadcastQueryStage", "ReusedExchange"):
                return t
            if base in ("InputAdapter", "WholeStageCodegen") and t["children"]:
                t = t["children"][0]
                continue
            return None

    def visit(node):
        base = node["name"].split(" (")[0].strip()
        if base == "BroadcastNestedLoopJoin":
            bc = None
            for c in node["children"]:
                bc = top_exchange(c)
                if bc is not None:
                    break
            if bc is None:
                out.append(
                    f"- `{name}`: BNLJ with NO broadcast side found — BUG"
                )
            else:
                r = _first_rows(bc)
                what = _describe(bc)
                verdict = (
                    "bounded"
                    if r is not None and r <= BOUNDED_ROWS
                    else "NOT BOUNDED — BUG"
                )
                out.append(
                    f"- `{name}`: BNLJ build side = {what}, observed "
                    f"{r} row(s) — {verdict}"
                )
        elif base == "CartesianProduct":
            rs = [
                (_describe(c), _first_rows(c)) for c in node["children"]
            ]
            small = min((r for _, r in rs if r is not None), default=None)
            verdict = (
                "bounded"
                if small is not None and small <= BOUNDED_ROWS
                else "NOT BOUNDED — BUG"
            )
            sides = " x ".join(f"{w}({r} rows)" for w, r in rs)
            out.append(
                f"- `{name}`: CartesianProduct {sides}; smaller side "
                f"{small} row(s) — {verdict}"
            )
        for c in node["children"]:
            visit(c)

    visit(t)
    if not out:
        out.append(
            f"- `{name}`: nested-loop node in the static plan only — the "
            "post-AQE executed plan contains none (AQE replanned it away)."
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from crick_spark.plans import QUERIES
    from crick_spark.session import get_session

    spark = get_session("plan-audit")
    lines = [
        "# PLANS — physical-plan audit of the batch query inventory",
        "",
        f"Generated by `tools/plan_audit.py` at `{sf_dir}` "
        "(counts from `explain('formatted')`).",
        "",
        "Columns: **Exch** shuffle exchanges; **joins** broadcast/sort-merge/"
        "nested-loop; **scan cols** columns actually read per parquet scan "
        "(column pruning evidence); **push** scans with pushed filters; "
        "**WSCG** whole-stage-codegen spans; **Py** Python (Arrow) nodes.",
        "",
        "| query | Exch | BHJ | SMJ | BNLJ/cart | scan cols | push | WSCG | Py |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    flagged: list[str] = []
    for name, spec in sorted(QUERIES.items()):
        if any(s in name for s in SKIP_SUBSTR):
            continue
        try:
            df = spec.fn(spark, sf_dir)
            p = plan_text(df)
        except Exception as exc:  # pragma: no cover
            lines.append(f"| {name} | ERROR: {type(exc).__name__} | | | | | | | |")
            continue
        s = summarize(p)
        nl = s["bnlj"] + s["cartesian"]
        lines.append(
            f"| {name} | {s['exchange_nodes']} | {s['bhj']} | {s['smj']} "
            f"| {nl} | {s['scan_cols']} | {s['pushed']} | {s['codegen']} "
            f"| {s['python_nodes']} |"
        )
        if nl:
            try:
                flagged.extend(cartesian_evidence(name, spec.fn(spark, sf_dir)))
            except Exception as exc:  # pragma: no cover
                flagged.append(
                    f"- `{name}`: {nl} nested-loop/cartesian node(s); "
                    f"evidence probe failed: {type(exc).__name__} — BUG"
                )
        wide = [c for c in s["scan_cols"] if c > 8]
        if wide:
            flagged.append(
                f"- `{name}`: scan reads {max(wide)} columns — check pruning."
            )
    lines.append("")
    if flagged:
        lines.append("## Flags")
        lines.append("")
        lines.append(
            "Every nested-loop/cartesian node is ADJUDICATED per flag: the "
            "query is executed and the flag names the bounded side with its "
            "OBSERVED post-AQE row count (BroadcastExchange / smaller input "
            "numOutputRows metric).  `bounded` = the side is a constant-size "
            f"aggregate or candidate set (≤ {BOUNDED_ROWS} rows at this sf); "
            "a flag marked BUG is a real scale defect, not a note."
        )
        lines.append("")
        lines.extend(sorted(set(flagged)))
        lines.append("")
    lines.append("## Partition pruning")
    lines.append("")
    lines.append(
        "Two pruning paths are proven by structural tests, not timings: "
        "STATIC — a literal predicate on the partition column reaches the "
        "scan as a PartitionFilter (`partition_pruned_scan`; "
        "tests/test_plans.py::test_pruned_scan_prunes_partitions_and_columns); "
        "DYNAMIC — when the partition values come from a FILTERED dimension "
        "(the star-join shape that dominates at 100 TB), the fact scan "
        "carries `dynamicpruningexpression(o_year IN dynamicpruning#N)` fed "
        "by the dimension's broadcast "
        "(tests/test_plans.py::test_dynamic_partition_pruning_fires).  DPP "
        "is what keeps a dim-filtered fact join from scanning every "
        "partition when the year/tenant/day list is only known at run time."
    )
    lines.append("")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
