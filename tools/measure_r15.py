"""Round-14 optimization measurement harness (guide §1).

For each named query: 2 warm-ups at sf0.001, then N timed noop-sink
runs at $SPARK_GRAFT_SF_DIR (median reported), plus the number of
Spark JOBS the query launches (driver actions + the final noop write —
at toy scale per-job fixed overhead dominates, so job count is the
first-order cost model) and optionally the formatted plan written to
plans/r15/<query>_<tag>.txt.

Usage:
  python tools/measure_r15.py [--runs N] [--plans TAG] query [query ...]
  python tools/measure_r15.py --all          # every bench HEADLINE query
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from lens_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    plans_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_tag = args[i + 1]; i += 2
        elif args[i] == "--all":
            import bench
            names.extend(bench.HEADLINE); i += 1
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lens_spark-measure-r15")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    warm_dir = "/root/testdata/sf0.001"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {}
    for name in names:
        fn = queries[name]
        if os.path.isdir(warm_dir):
            for _ in range(2):
                try:
                    fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
                except Exception:
                    break
        secs = []
        njobs = None
        try:
            for r in range(runs):
                gc.collect()
                spark.sparkContext._jvm.System.gc()
                group = f"measure-{name}-{r}"
                spark.sparkContext.setJobGroup(group, name)
                start = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                secs.append(time.perf_counter() - start)
                spark.sparkContext.setJobGroup(None, None)
                jids = spark.sparkContext.statusTracker().getJobIdsForGroup(group)
                njobs = len(jids)
            if plans_tag:
                os.makedirs(os.path.join(here, "plans", "r15"), exist_ok=True)
                p = os.path.join(here, "plans", "r15",
                                 f"{name}_{plans_tag}.txt")
                with open(p, "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {str(exc)[:160]}"}
            print(json.dumps({name: out[name]}), flush=True)
            continue
        rec = {"median": round(statistics.median(secs), 3),
               "min": round(min(secs), 3), "max": round(max(secs), 3),
               "jobs": njobs, "runs": len(secs)}
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
        spark.catalog.clearCache()
    print("TOTAL " + json.dumps(
        {"median_sum": round(sum(v.get("median", 0) for v in out.values()), 2),
         "n": len(out)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
