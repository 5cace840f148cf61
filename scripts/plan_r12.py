"""Round-12 optimization plan capture: dump .explain("formatted") for the
named queries to plans/r12/<query>_<tag>.txt at sf0.1 (the bench scale).

Unlike round 11's capture (which ran a SEPARATE noop-write QueryExecution,
leaving the dumped Dataset's own plan at isFinalPlan=false — ADVICE r11),
this executes the Dataset's OWN QueryExecution (executedPlan().execute()
.count(), no rows collected to the driver) so the dump carries the
AQE-FINAL plan: runtime SMJ->SHJ conversions, AQEShuffleRead coalescing
and skew splits all appear.

Usage: python scripts/plan_r12.py before q286_cross_corpus_ann
       python scripts/plan_r12.py after  q286_cross_corpus_ann
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
)


def dump_final_plan(spark, df, path: str) -> None:
    qe = df._jdf.queryExecution()
    # run THIS QueryExecution to finalize its AdaptiveSparkPlan; count()
    # on the InternalRow RDD moves no row data to the driver
    qe.executedPlan().execute().count()
    plan = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    with open(path, "w") as f:
        f.write(plan.strip() + "\n")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "tag must be before|after"
    os.makedirs(OUT_DIR, exist_ok=True)

    from binance_data_ingestor_spark.queries import registry
    from binance_data_ingestor_spark.session import get_spark

    spark = get_spark("plan-r12", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs, _ = registry()
    for name in names:
        df = qs[name](spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        dump_final_plan(spark, df, path)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
