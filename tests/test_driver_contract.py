"""Driver-contract invariants: the 50-query correctness window stays
exactly 50, every window name exists, every query has an oracle, and any
query rotated past the window was already proven green in a committed
CORRECTNESS_r*.json — so the union of driver records + the committed
self-check always covers the full surface."""

import json
import os

import __spark_entry__ as em

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ordered_names():
    qs = em._raw_queries()
    prio = {n: i for i, n in enumerate(em._DRIVER_WINDOW)}
    return sorted(qs, key=lambda n: (prio.get(n, len(prio)), n)), qs


def test_window_is_exactly_fifty_known_names():
    ordered, qs = _ordered_names()
    assert len(em._DRIVER_WINDOW) == 50
    assert set(em._DRIVER_WINDOW) <= set(qs)
    assert ordered[:50] == em._DRIVER_WINDOW


def test_every_query_has_an_oracle():
    qs = em._raw_queries()
    missing = set(qs) - set(em.oracle_sql())
    assert not missing, f"queries without oracle_sql: {sorted(missing)}"


def test_rotated_out_queries_have_committed_green_records():
    ordered, _ = _ordered_names()
    proven = set()
    for f in sorted(os.listdir(REPO)):
        if f.startswith("CORRECTNESS_r") and f.endswith(".json"):
            rec = json.load(open(os.path.join(REPO, f)))
            for name, row in rec.items():
                if row.get("hash_match"):
                    proven.add(name)
    unproven_tail = set(ordered[50:]) - proven
    assert not unproven_tail, (
        f"queries outside the driver window with no committed green "
        f"record: {sorted(unproven_tail)} — rotate them into "
        f"_DRIVER_WINDOW or wait a round"
    )


def test_queries_callable_registry_consistent():
    qs = em.queries()
    raw = em._raw_queries()
    assert set(qs) == set(raw)
    assert list(qs)[:50] == em._DRIVER_WINDOW
