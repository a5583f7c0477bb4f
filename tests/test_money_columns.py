"""Pin the non-negativity assumption behind the FLOOR-based integer-cents
SQL templates (__spark_entry__._SQL_PRICING etc.): FLOOR(x*100 + 0.5) equals
HALF-AWAY-FROM-ZERO rounding only for x >= 0. _cents_sum itself is
sign-aware, but the cross-engine SQL templates use the bare form — this
test fails loudly if the testdata generator ever starts emitting negative
money amounts (refunds/corrections), before a silent +inf-ward drift could
reach an oracle compare."""

import duckdb
import pytest

from tests.conftest import SF_DIR


MONEY_COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "part": ["p_retailprice"],
    "events": ["value"],
}


@pytest.mark.parametrize("table", sorted(MONEY_COLS))
def test_money_columns_non_negative(table):
    cols = MONEY_COLS[table]
    con = duckdb.connect()
    mins = con.execute(
        f"SELECT {', '.join(f'min({c})' for c in cols)} "
        f"FROM read_parquet('{SF_DIR}/{table}.parquet')"
    ).fetchone()
    con.close()
    bad = [f"{c} min={m}" for c, m in zip(cols, mins) if m is not None and m < 0]
    assert not bad, (
        f"{table} has negative money values ({bad}); the FLOOR-based "
        "integer-cents templates assume x >= 0 — switch them to the "
        "sign-aware form in _cents_sum"
    )


def test_cents_sum_sign_aware(spark):
    """_cents_sum must round half away from zero for BOTH signs (DuckDB
    ROUND semantics) — the library-side guard for negative amounts."""
    df = spark.createDataFrame(
        [(1.005,), (-1.005,), (2.675,), (-2.675,), (0.0,)], ["x"]
    )
    import __spark_entry__ as se

    rows = {
        r["x"]: r["c"]
        for r in df.groupBy("x").agg(se._cents_sum("x", "c")).collect()
    }
    # 1.005 * 100 = 100.49999... in binary → 100; the point is symmetry
    for x in rows:
        assert rows[x] == -rows.get(-x, -rows[x]) if x != 0.0 else rows[x] == 0
    assert rows[2.675] == -rows[-2.675]
    assert rows[1.005] == -rows[-1.005]
