"""Concurrent-session throughput bench: N clients sharing one SparkSession.

A 100 TB cluster serves many users at once; all prior benches are
single-query serial. This script runs the 18 headline queries N-way
concurrent — N threads, each executing the full headline set in a
thread-specific order, every thread in its own FAIR-scheduler pool so no
single long stage starves the rest (spark.scheduler.mode=FAIR is set for
this session; pools are per-thread via the scheduler.pool local
property). Reported:

- serial_total: one timed single-threaded pass (same noop-write forcing
  as bench.py, after an untimed warm-up pass that materializes caches
  and JIT)
- concurrent_makespan: wall clock for N threads x 18 queries
- throughput_x: N * serial_total / concurrent_makespan — perfect scaling
  on an idle 32-core box approaches min(N, cores/avg-query-width);
  values well under 1 x N indicate interference (cache thrash, unified-
  memory contention), the pathology this bench exists to catch
- per-query worst-case latency under concurrency vs serial (p100 ratio)

    python examples/bench_concurrent.py [sf_dir=/root/testdata/sf0.1] [n=4]

Writes one JSON line; the round artifact is BENCH_CONCURRENT_r{N}.json.
"""

from __future__ import annotations

import json
import os
import random
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_CLIENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import HEADLINE, _force
    from v3_polars_spark.session import (
        get_spark,
        quiet_expected_jvm_warnings,
        tune_shuffle_partitions,
    )

    spark = get_spark(
        app_name="bench-concurrent",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    quiet_expected_jvm_warnings(spark)
    input_bytes = sum(
        os.path.getsize(os.path.join(SF_DIR, f))
        for f in os.listdir(SF_DIR)
        if f.endswith(".parquet")
    )
    tune_shuffle_partitions(spark, input_bytes)
    queries = entrymod.queries()

    # warm-up: materialize caches + JIT (untimed)
    for name in HEADLINE:
        _force(queries[name](spark, SF_DIR))

    # serial reference pass
    serial = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(queries[name](spark, SF_DIR))
        serial[name] = time.perf_counter() - t0
    serial_total = sum(serial.values())

    # concurrent pass: each client runs the full set in its own order
    conc_lat: dict[str, list[float]] = {n: [] for n in HEADLINE}
    errors: list[str] = []

    def client(cid: int) -> None:
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"client{cid}"
        )
        order = HEADLINE[:]
        random.Random(cid).shuffle(order)
        for name in order:
            t0 = time.perf_counter()
            try:
                _force(queries[name](spark, SF_DIR))
            except Exception as exc:  # noqa: BLE001
                errors.append(f"{name}: {exc}")
                return
            conc_lat[name].append(time.perf_counter() - t0)

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(N_CLIENTS)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    makespan = time.perf_counter() - t0
    assert not errors, errors

    worst_ratio = {
        name: round(max(conc_lat[name]) / max(serial[name], 1e-9), 2)
        for name in HEADLINE
    }
    print(
        json.dumps(
            {
                "metric": "concurrent_headline",
                "sf_dir": SF_DIR,
                "n_clients": N_CLIENTS,
                "serial_total_sec": round(serial_total, 3),
                "concurrent_makespan_sec": round(makespan, 3),
                "throughput_x": round(
                    N_CLIENTS * serial_total / makespan, 2
                ),
                "worst_query_latency_ratio": dict(
                    sorted(
                        worst_ratio.items(), key=lambda kv: -kv[1]
                    )[:6]
                ),
                "serial": {k: round(v, 3) for k, v in serial.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
