"""Capture .explain('formatted') for named queries into plans/r13/.

Usage: python plans/r13/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after'
  queries: default = the bench HEADLINE set.

Each plan is captured AFTER one forcing run (noop sink) so AQE's final
plan shape is the one the file describes — matching PLANS.md's protocol.
Writes plans/r13/<query>_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", "r13")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from v3_polars_spark.session import get_spark, quiet_expected_jvm_warnings, tune_shuffle_partitions

    if not names:
        names = list(HEADLINE)

    spark = get_spark(app_name=f"plans-r13-{suffix}")
    quiet_expected_jvm_warnings(spark)
    input_bytes = sum(
        os.path.getsize(os.path.join(SF_DIR, f))
        for f in os.listdir(SF_DIR)
        if f.endswith(".parquet")
    )
    tune_shuffle_partitions(spark, input_bytes)

    qs = entrymod.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"plans-r13: {name}")
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # AQE-final shape
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {SF_DIR} ({suffix})\n")
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
