"""Report sink (SURVEY.md S8).

Reference: SliceCheckResultManager writes summary.log, success.log,
failed.log and per-table repair files, capping displayed diff keys at
100 per category (MAX_DISPLAY_SIZE, CheckResultConstants.java:34,
AbstractCheckDiffResultBuilder.java:292-312).

Here: full violation set → parquet (distributed write); verdicts →
parquet; a human summary JSON with per-constraint totals and the
first ≤100 violating keys per (constraint, detail) category, ordered
by key (the reference keeps sorted TreeSets,
CheckDiffResult.initEmptyCollections:132-136).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opengauss_tools_datachecker_performance_spark.plans.runner import ValidationResult

MAX_DISPLAY_SIZE = 100  # CheckResultConstants.java:34


def write_report(result: ValidationResult, out_dir: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    result.violations.write.mode("overwrite").parquet(os.path.join(out_dir, "violations.parquet"))
    result.verdicts.write.mode("overwrite").parquet(os.path.join(out_dir, "verdicts.parquet"))

    verdict_rows = result.verdicts.collect()  # grid: #parts × #constraints
    by_constraint: dict[str, dict] = {}
    for r in verdict_rows:
        c = by_constraint.setdefault(
            r["constraint"], {"n_violations": 0, "failed_partitions": []}
        )
        c["n_violations"] += r["n_violations"]
        if r["status"] == "fail":
            c["failed_partitions"].append(r["part"])

    # first ≤100 keys per (constraint, detail) category, key-ordered
    w = Window.partitionBy("constraint", "detail").orderBy("key")
    display = (
        result.violations.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MAX_DISPLAY_SIZE)
        .drop("rn")
        .collect()
    )
    display_keys: dict[str, list] = {}
    for r in display:
        cat = r["constraint"] + (f":{r['detail']}" if r["detail"] else "")
        display_keys.setdefault(cat, []).append(
            {"key": r["key"], "part": r["part"], "span_idx": r["span_idx"]}
        )

    summary = {
        "schema_ok": result.schema_ok,
        "schema_message": result.schema_message,
        "result": "success"
        if result.schema_ok and all(r["status"] == "pass" for r in verdict_rows)
        else "failed",
        "constraints": by_constraint,
        "display_keys": display_keys,
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    # success.log / failed.log analogues
    passed = sorted(
        {r["part"] for r in verdict_rows}
        - {r["part"] for r in verdict_rows if r["status"] == "fail"}
    )
    failed = sorted({r["part"] for r in verdict_rows if r["status"] == "fail"})
    with open(os.path.join(out_dir, "success.log"), "w") as f:
        f.writelines(f"partition {p}: pass\n" for p in passed)
    with open(os.path.join(out_dir, "failed.log"), "w") as f:
        f.writelines(f"partition {p}: fail\n" for p in failed)
    return summary
