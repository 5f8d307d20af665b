"""Automated scale-contract audit over the WHOLE query registry.

For every entry in ``__spark_entry__.queries()`` this builds the
DataFrame (sf0.01, nothing executed — plan inspection only) and records
the properties that decide whether the plan survives a 100×–1000×
scale-up:

- ``shuffles``       — Exchange count (every one is a full network pass
                       over its input at 100 TB)
- ``broadcast``      — whether any join is broadcast (dimension joins
                       must be; a missing broadcast turns a map-side
                       join into a fact-table shuffle)
- ``python_eval``    — row-at-a-time Python in the plan
                       (BatchEvalPython): NEVER acceptable in this repo
- ``arrow_eval``     — Arrow-vectorized Python stages (ArrowEvalPython /
                       FlatMapGroupsInPandas / MapInPandas...): the
                       sanctioned Pandas-UDF slow path; audited so
                       growth is deliberate
- ``cartesian``      — CartesianProduct nodes: NEVER acceptable
                       (BroadcastNestedLoopJoin for 1-row scalar
                       aggregates is counted separately as ``bnlj``)
- ``codegen_spans``  — WholeStageCodegen span count
- ``checkpoint_scans`` / ``hidden_shuffles`` — a localCheckpoint severs
                       lineage, so the final plan shows an opaque
                       ``Scan ExistingRDD`` where the input's exchanges
                       used to be and ``shuffles`` UNDERCOUNTS
                       (VERDICT r6). Library checkpoint sites register
                       their pre-materialization plans via
                       ``plans.audit_trace``; the audit builds each
                       query under a trace and reports the hidden
                       exchanges separately — the honest total is
                       ``shuffles + hidden_shuffles``. Iterative
                       operators (connected components) trace one
                       representative round, so hidden counts are
                       per-round there, noted by the scan count.

Usage:
    python tools/plan_audit.py                  # print table, write PLAN_AUDIT.json
    python tools/plan_audit.py name1 name2 ...  # audit a subset

``tests/test_plan_audit.py`` pins the recorded baseline: a change that
adds a shuffle, drops a broadcast, or introduces row-Python to ANY
registry query fails CI — the 100 TB regression gate, automated.

Queries that materialize side state (ingest/consume/stateful/streaming
families) execute work when *built*; they are audited all the same —
the plan inspected is the final returned DataFrame's.
"""

from __future__ import annotations

import json
import os
import re
import sys

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.json")


def audit_one(df, traced: list | None = None) -> dict:
    from polar_spark.plans.explain import (
        arrow_stage_count_text,
        codegen_spans_text,
        explain_str,
        global_window_count_text,
        shuffle_count_text,
    )

    text = explain_str(df)
    rec = {
        "shuffles": shuffle_count_text(text),
        "broadcast": "BroadcastHashJoin" in text,
        "bnlj": "BroadcastNestedLoopJoin" in text,
        "python_eval": "BatchEvalPython" in text,
        "arrow_eval": arrow_stage_count_text(text),
        "cartesian": "CartesianProduct" in text,
        "codegen_spans": codegen_spans_text(text),
        # empty-partitionBy windows: single-task sorts. Non-zero is
        # tolerable ONLY over aggregate-/value-domain-sized inputs
        # (months, value histograms) — never a fact table (VERDICT r4)
        "global_window": global_window_count_text(text),
        # opaque materialized inputs in the FINAL plan (each one hides
        # its build's exchanges behind a checkpoint). The scan's
        # Arguments line names the RDD's call site, which separates a
        # checkpoint scar ("at localCheckpoint") from a benign
        # parallelized local relation ("at applySchemaToPythonRDD" — a
        # createDataFrame of a driver list hides nothing)
        "checkpoint_scans": len(
            re.findall(r"MapPartitionsRDD\[\d+\] at (?:local)?[Cc]heckpoint", text)
        ),
    }
    if traced:
        hidden = 0
        labels: dict[str, int] = {}
        for label, pre in traced:
            try:
                hidden += shuffle_count_text(explain_str(pre))
            except Exception:
                label = f"{label} (unreadable)"
            labels[label] = labels.get(label, 0) + 1
        rec["hidden_shuffles"] = hidden
        rec["checkpoint_labels"] = labels
    elif rec["checkpoint_scans"]:
        # a scar with no trace — a checkpoint site missing its
        # note_materialization call; flag rather than silently
        # understate
        rec["hidden_shuffles"] = None
    return rec


def main(names: list[str]) -> int:
    sys.path.insert(0, os.path.dirname(OUT))
    import __spark_entry__ as entry
    from polar_spark import get_spark

    spark = get_spark(app_name="plan_audit", shuffle_partitions=8)
    queries = entry.queries()
    if names:
        queries = {n: queries[n] for n in names}
    report: dict[str, dict] = {}
    failures: list[str] = []
    from polar_spark.plans.audit_trace import start_trace, stop_trace

    for name, fn in queries.items():
        start_trace()
        try:
            built = fn(spark, SF_DIR)
            rec = audit_one(built, traced=stop_trace())
        except Exception as ex:  # pragma: no cover - audit robustness
            stop_trace()
            rec = {"error": f"{type(ex).__name__}: {ex}"[:200]}
            failures.append(name)
        report[name] = rec
        flags = " ".join(
            k
            for k in ("python_eval", "cartesian")
            if rec.get(k)
        )
        hidden = rec.get("hidden_shuffles")
        hid = (
            f" (+{hidden} ckpt)" if hidden
            else (" (+? ckpt)" if hidden is None and rec.get("checkpoint_scans") else "")
        )
        print(
            f"{name:40s} sh={rec.get('shuffles', '?'):>2}{hid} "
            f"bc={'y' if rec.get('broadcast') else '.'} "
            f"arrow={rec.get('arrow_eval', 0)} "
            f"cg={rec.get('codegen_spans', '?')} {flags}"
        )
    regressions: list[str] = []
    if not names and os.path.exists(OUT):
        with open(OUT) as f:
            baseline = json.load(f)
        for n, rec in report.items():
            old = baseline.get(n)
            if not old or "error" in old or "error" in rec:
                continue
            if rec["shuffles"] > old["shuffles"]:
                regressions.append(f"{n}: shuffles {old['shuffles']}→{rec['shuffles']}")
            if old["broadcast"] and not rec["broadcast"]:
                regressions.append(f"{n}: broadcast join lost")
            if rec["arrow_eval"] > old["arrow_eval"]:
                regressions.append(
                    f"{n}: arrow stages {old['arrow_eval']}→{rec['arrow_eval']}"
                )
            if rec["global_window"] > old.get("global_window", 0):
                regressions.append(
                    f"{n}: global (empty-partitionBy) windows "
                    f"{old.get('global_window', 0)}→{rec['global_window']}"
                )
    if not names:
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"report written: {OUT}")
    bad = [n for n, r in report.items() if r.get("python_eval") or r.get("cartesian")]
    rc = 0
    if bad:
        print(f"SCALE VIOLATIONS (row-Python or cartesian): {bad}")
        rc = 1
    untraced = [
        n
        for n, r in report.items()
        if r.get("checkpoint_scans") and r.get("hidden_shuffles") is None
    ]
    if untraced:
        print(
            "UNTRACED CHECKPOINTS (Scan ExistingRDD with no "
            f"note_materialization trace — shuffle count understated): {untraced}"
        )
        rc = 1
    if regressions:
        print("PLAN REGRESSIONS vs committed baseline (intentional changes: "
              "commit the rewritten PLAN_AUDIT.json):")
        for r in regressions:
            print(f"  {r}")
        rc = 1
    if failures:
        print(f"plan build failures: {failures}")
        rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
