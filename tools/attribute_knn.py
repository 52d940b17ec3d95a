"""Measured attribution of the r9 `x3_knn_graph` bench flag (VERDICT r9
"What's wrong" #1) — the same isolated-process protocol that closed the
r8 `x9_filter_funnel` flag.

The r9 driver bench recorded 5.792s median (3 runs: 3.833/5.792/15.501
— a 4x intra-round spread) on code byte-identical to r8's 2.045s run.
This tool separates "the plan got slower" from "one contended sandbox
run set a 3-run median" by timing the query under three regimes, each
run in a FRESH python/JVM process so no bench-session heap history or
run-order effect can leak in:

  isolated   — warm-up at sf0.001 x2, per-run GC, timed at sf0.1;
               the query alone in the JVM.
  post_pred  — identical, but the bench-order predecessor
               (x9_quantile_bin) runs once at sf0.1 first, mimicking
               the heap/broadcast state knn_graph inherits mid-bench.
  no_ckpt    — isolated, with DataFrame.localCheckpoint patched to a
               no-op, isolating the `localCheckpoint(eager=False)` at
               similarity.py (the r9 verdict's named suspect).

Every process also times the PINNED bench calibration workload so the
numbers normalize across machine-speed drift exactly like BENCH_r*.json.

Usage:
    python tools/attribute_knn.py            # 5 runs per regime, summary
    python tools/attribute_knn.py --runs 7
    python tools/attribute_knn.py --one isolated   # (internal) one run

NOTE (post-attribution): the measured fix landed in r10 — knn_graph no
longer localCheckpoints the exploded table, so `isolated` now times
the shipped (fixed) code and `no_ckpt` is redundant with it; both are
kept so the protocol can re-attribute any future checkpoint-suspect
query by swapping QUERY/PREDECESSOR.

r11: generalized for the embedding-family cluster (VERDICT r10 "What's
wrong" #1, suspect clustering.py kmeans-input localCheckpoint):
`--query x2_semdedup` retargets the protocol, and the new
`disk_persist` regime swaps every localCheckpoint for
persist(StorageLevel.DISK_ONLY) — storage memory freed, recompute
still avoided — separating "pinning in executor storage memory hurts"
from "re-reading the lineage hurts". The bench-order predecessor is
looked up from bench.HEADLINE automatically.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
QUERY = "x3_knn_graph"
VARIANTS = ("isolated", "post_pred", "no_ckpt", "disk_persist")


def _predecessor(query: str) -> "str | None":
    """The query directly before `query` in bench.py HEADLINE order —
    the heap/broadcast state it inherits mid-bench. None for the
    FIRST headline query: it runs right after the start calibration
    on a fresh heap, so there is no predecessor state to simulate
    (post_pred then degrades to the isolated regime rather than
    fabricating one — r11 review)."""
    from bench import HEADLINE

    i = HEADLINE.index(query)
    return HEADLINE[i - 1] if i > 0 else None


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_one(variant: str, query: str) -> dict:
    import __spark_entry__ as entrymod
    from bench import _calibration_df
    from lens_spark.session import get_spark

    if variant == "no_ckpt":
        from pyspark.sql import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self
    elif variant == "disk_persist":
        from pyspark import StorageLevel
        from pyspark.sql import DataFrame

        DataFrame.localCheckpoint = (
            lambda self, eager=True: self.persist(StorageLevel.DISK_ONLY))

    spark = get_spark("lens_spark-attr-knn")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    fn = queries[query]

    for _ in range(2):  # same warm-up regime as bench.py
        _noop(fn(spark, WARM_DIR))
    if variant == "post_pred":
        pred = _predecessor(query)
        if pred is not None:
            _noop(queries[pred](spark, SF_DIR))

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    start = time.perf_counter()
    _noop(fn(spark, SF_DIR))
    knn_sec = time.perf_counter() - start

    for _ in range(2):
        _noop(_calibration_df(spark))
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    start = time.perf_counter()
    _noop(_calibration_df(spark))
    cal = time.perf_counter() - start
    return {"variant": variant, "knn_sec": round(knn_sec, 3),
            "calibration": round(cal, 3)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", choices=VARIANTS)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--query", default=QUERY)
    ap.add_argument("--variants", default="isolated,no_ckpt,disk_persist",
                    help="comma list from " + ",".join(VARIANTS))
    args = ap.parse_args()

    if args.one:
        print(json.dumps(run_one(args.one, args.query)))
        return 0

    results: dict[str, list[dict]] = {}
    for variant in [v for v in args.variants.split(",") if v]:
        results[variant] = []
        for i in range(args.runs):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one", variant, "--query", args.query],
                capture_output=True, text=True, cwd=REPO, timeout=600)
            line = out.stdout.strip().splitlines()[-1] if out.stdout else ""
            try:
                rec = json.loads(line)
            except Exception:
                print(f"{variant} run {i}: FAILED\n{out.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            results[variant].append(rec)
            print(f"{variant} run {i}: knn={rec['knn_sec']}s "
                  f"cal={rec['calibration']}s", file=sys.stderr)

    summary = {}
    for variant, recs in results.items():
        if not recs:
            summary[variant] = {"runs": 0}
            continue
        knn = [r["knn_sec"] for r in recs]
        cal = [r["calibration"] for r in recs]
        med_cal = statistics.median(cal)
        summary[variant] = {
            "runs": len(recs),
            "knn_median": round(statistics.median(knn), 3),
            "knn_min": round(min(knn), 3),
            "knn_max": round(max(knn), 3),
            "cal_median": round(med_cal, 3),
            "knn_norm_median": round(statistics.median(knn) / med_cal, 3),
        }
    print(json.dumps({"query": args.query, "regimes": summary}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
