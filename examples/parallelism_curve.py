"""Parallelism-scaling curve: prove no headline query hides a single-task
stage.

Runs the bench headline set at local[4] / local[8] / local[16] / local[32]
(one subprocess per setting — a JVM's master is fixed at startup) and
prints per-query walls plus the aggregate speedup curve. A query whose
wall does not improve past local[8] either has a hidden serial stage (a
bug this script exists to catch) or is an O(ticks) v3 frame that is
single-partition BY DESIGN (SURVEY §3.2 — quote_ladder, swap_frame,
series_pipeline and the liquidity frames are driver-small tick ladders;
they are listed in EXEMPT below and reported but not judged).

Usage:
    python examples/parallelism_curve.py [sf_dir=/tmp/sf1]
    python examples/parallelism_curve.py --worker <cores> <sf_dir>  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES = [4, 8, 16, 32]
# O(ticks) tick-frame pipelines: single-partition by design, exempt from
# the scaling judgement (they are sub-second constants at every width)
EXEMPT = {"quote_ladder", "liquidity_dist", "liquidity_timeline"}
# Data-sized queries whose flat curve has been plan-audited to a named
# width-invariant constant (NOT a hidden serial stage — each scales with
# data and with machines, just not with local threads at this size):
AUDITED_FLAT = {
    "series_pipeline": (
        "partial agg emits #splits x 100k ts rows (3.2M) into the shuffle"
        " — width-invariant; final agg + 4 stage floors dominate"
    ),
    "dp_dedup_exact": (
        "multi-stage md5 agg over a 500k-doc input — stage floors dominate"
        " past ~8 threads"
    ),
    "dp_minhash_lsh": (
        "~20 SEQUENTIAL collapse/band/verify stages; constant in executors,"
        " linear in data (executed-plan audit: zero SMJs, all tiny joins"
        " broadcast)"
    ),
}


def worker(cores: int, sf_dir: str) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    import bench  # noqa: F401  (for HEADLINE)
    import __spark_entry__ as em
    from v3_polars_spark.session import (
        get_spark,
        quiet_expected_jvm_warnings,
        tune_shuffle_partitions,
    )

    spark = get_spark(app_name=f"par-curve-{cores}")
    quiet_expected_jvm_warnings(spark)
    input_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir) if f.endswith(".parquet")
    )
    tune_shuffle_partitions(spark, input_bytes)
    qs = em.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    trials = int(os.environ.get("SPARK_GRAFT_CURVE_TRIALS", "2"))
    names_env = os.environ.get("SPARK_GRAFT_CURVE_QUERIES")
    names = names_env.split(",") if names_env else bench.HEADLINE
    walls = {}
    for name in names:
        force(qs[name](spark, sf_dir))  # warm-up (JIT, cache build)
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        walls[name] = round(best, 3)
    print("WORKER_JSON:" + json.dumps({"cores": cores, "walls": walls}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return
    results = {}
    if len(sys.argv) > 1 and sys.argv[1] == "--report":
        # aggregate pre-run worker outputs (grep WORKER_JSON > /tmp/curve_N.json)
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
        for c in CORES:
            with open(f"/tmp/curve_{c}.json") as f:
                line = f.read().strip()
            results[c] = json.loads(line[len("WORKER_JSON:"):])["walls"]
    else:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
        for c in CORES:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", str(c), sf_dir],
                capture_output=True, text=True, timeout=1800,
            )
            line = next(
                (ln for ln in out.stdout.splitlines() if ln.startswith("WORKER_JSON:")),
                None,
            )
            if line is None:
                print(out.stdout[-2000:], out.stderr[-2000:])
                raise RuntimeError(f"worker local[{c}] produced no result")
            results[c] = json.loads(line[len("WORKER_JSON:"):])["walls"]
            total = sum(results[c].values())
            print(f"local[{c}]: total {total:.2f}s", flush=True)

    names = list(results[CORES[0]])
    print(f"\n{'query':<22}" + "".join(f"local[{c}]".rjust(10) for c in CORES)
          + "  x4->x32  verdict")
    flagged = []
    for n in names:
        row = [results[c][n] for c in CORES]
        speedup = row[0] / row[-1] if row[-1] > 0 else float("inf")
        # judged on data-sized queries only; rows that touch the ~0.3s
        # multi-stage floor at ANY width are floor-bound, not serial
        if n in EXEMPT:
            verdict = "exempt (tick frame)"
        elif speedup >= 1.8:
            verdict = "scales"
        elif min(row) < 0.3:
            verdict = "floor-bound"
        elif n in AUDITED_FLAT:
            verdict = f"flat, audited: {AUDITED_FLAT[n]}"
        else:
            verdict = "FLAT — audit me"
            flagged.append(n)
        print(f"{n:<22}" + "".join(f"{v:>10.3f}" for v in row)
              + f"  {speedup:>6.2f}x  {verdict}")
    print("\nAGG total: " + " ".join(
        f"local[{c}]={sum(results[c].values()):.2f}s" for c in CORES
    ))
    print(json.dumps({"sf_dir": sf_dir, "results": results, "flagged": flagged}))


if __name__ == "__main__":
    main()
