"""Round-11 optimization plan capture: dump .explain("formatted") for the
named queries to plans/r11/<query>_<tag>.txt at sf0.1 (the bench scale).

Usage: python scripts/plan_r11.py before q277_ad_drift q255_wasserstein_drift
       python scripts/plan_r11.py after  q277_ad_drift

The plan is the AQE-final plan (query executed through the noop sink
first, matching bench methodology) so Exchange counts / join strategies
reflect what the bench actually runs, not the pre-AQE guess.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "tag must be before|after"
    os.makedirs(OUT_DIR, exist_ok=True)

    from binance_data_ingestor_spark.queries import registry
    from binance_data_ingestor_spark.session import get_spark

    spark = get_spark("plan-r11", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs, _ = registry()
    for name in names:
        fn = qs[name]
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # let AQE finalize
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan.strip() + "\n")
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
