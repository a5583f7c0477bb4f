"""The SQL surface in one file: register the analytics tables, run
portable SQL through spark.sql — the same Catalyst plans as the
DataFrame API.

    python examples/sql_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from v3_polars_spark.session import get_spark
from v3_polars_spark.sql import register_testdata

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="sql-quickstart")
    views = register_testdata(spark, SF, em._t)

    print("-- pricing summary (TPC-H Q1 shape) --")
    spark.sql(em._SQL_PRICING.format(**views)).show()

    print("-- regional supplier volume (6-table join, dims broadcast) --")
    df = spark.sql(em._SQL_REGION_VOLUME.format(**views))
    df.show()
    df.explain("formatted")

    spark.stop()


if __name__ == "__main__":
    main()
