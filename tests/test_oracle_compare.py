"""The hashed multiset compare path of the oracle harness (the scale
path taken for results above BIG_ROWS — e.g. sf1 derived_math at 60 M
rows, where the per-cell loop is not viable). Pure pandas/numpy; no
Spark session."""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_check import BIG_ROWS, compare, compare_hashed


def _frame(n=50_000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "i": np.arange(n, dtype=np.int32),
            "f": np.where(np.arange(n) % 7 == 0, np.nan, np.arange(n) * 1.5),
            "s": pd.Series(np.arange(n) % 1000).astype(str),
            "t": pd.to_datetime(np.arange(n) % 86_400, unit="s"),
        }
    )


def _engine_skewed_twin(a: pd.DataFrame, seed=1) -> pd.DataFrame:
    """Same logical rows, permuted, with the dtype skews the two engines
    actually produce: int32 vs int64, us- vs ns-timestamps."""
    perm = np.random.default_rng(seed).permutation(len(a))
    b = a.iloc[perm].reset_index(drop=True)
    b["i"] = b["i"].astype("int64")
    b["t"] = b["t"].astype("datetime64[us]")
    return b


def test_equal_multisets_pass():
    a = _frame()
    assert compare_hashed(a, _engine_skewed_twin(a)) == []


def test_zero_sign_and_nan_canonicalized():
    a = _frame()
    a.loc[3, "f"] = -0.0
    b = _engine_skewed_twin(a)
    b.loc[b.index[b["i"] == 3], "f"] = 0.0
    assert compare_hashed(a, b) == []


def test_single_cell_diff_detected():
    a = _frame()
    b = _engine_skewed_twin(a)
    b.loc[123, "f"] = 999.25
    errs = compare_hashed(a, b)
    assert errs and "mismatch" in errs[0]


def test_column_order_insensitive():
    a = _frame()
    b = _engine_skewed_twin(a)[["t", "s", "f", "i"]]
    assert compare_hashed(a, b) == []


def test_decimal_vs_float_canonicalized():
    """Spark DecimalType collects as object-dtype Decimal; the other
    engine's float64 twin must hash-match (and real diffs must not)."""
    from decimal import Decimal as D

    a = pd.DataFrame({"x": [D("1.50"), D("2.25"), None]})
    b = pd.DataFrame({"x": [2.25, 1.5, np.nan]})
    assert compare_hashed(a, b) == []
    bad = pd.DataFrame({"x": [D("1.51"), D("2.25"), None]})
    assert compare_hashed(bad, b)
    # object-vs-object numeric-looking strings stay string-compared
    s1 = pd.DataFrame({"x": pd.Series(["001", "2"], dtype=object)})
    s2 = pd.DataFrame({"x": pd.Series(["1", "2"], dtype=object)})
    assert compare_hashed(s1, s2)


def test_dispatch_threshold():
    # compare() routes big frames to the hashed path and still catches
    # a diff there; small frames keep the exact per-cell path
    n = BIG_ROWS + 1
    a = pd.DataFrame({"x": np.arange(n, dtype=np.int64)})
    b = a.copy()
    b.loc[77, "x"] = -1
    assert compare("big", a, b)
    assert compare("big-ok", a, a.iloc[::-1].reset_index(drop=True)) == []
    small = pd.DataFrame({"x": [1, 2, 3]})
    assert compare("small", small, pd.DataFrame({"x": [3, 2, 1]})) == []
    assert compare("small-bad", small, pd.DataFrame({"x": [3, 2, 0]}))
