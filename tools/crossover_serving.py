"""Measure the serving-vs-inline crossover for the materialized
retrieval indexes (VERDICT r11 "Next round" #4).

SCALE.md r11 recorded the honest toy-scale point — at 5k templated
docs INLINE wins, because serving pays fixed overheads (DPP subquery,
dedupe-before-sum exchange, two window stages) that don't shrink with
corpus size while inline's full-corpus tokenize is nearly free — and
ARGUED the crossover. This tool measures it: synthetic corpora at
several sizes with realistic document lengths (50-250 tokens drawn
zipf-ish from a 30k vocabulary), a FIXED query, and both paths timed
in one process per size (fresh JVM per size, so no cross-size heap
history), each with the pinned bench calibration workload so numbers
normalize across machine drift.

  inline  — the operator a user without the index runs per query:
            `bm25_score` (tokenizes every corpus text byte), or
            `ivfpq_topk` with a PRE-FIT model (encodes every corpus
            vector per panel) for --family ivfpq.
  served  — `postings_index_search` / `ivfpq_index_search` over the
            pre-built index (scan pruned to the query's term buckets
            / probed cells). Build time reported separately: it is
            paid once, amortized over every query thereafter.

Usage:
    python tools/crossover_serving.py --family postings
    python tools/crossover_serving.py --family ivfpq --sizes 5000,20000
    python tools/crossover_serving.py --one postings 20000   # internal

Results land in SCALE.md's Round-12 table by hand; artifacts under
/tmp/lens_crossover are content-keyed by (family, size) and reused.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/lens_crossover"
VOCAB = 30_000
#: Mid/tail-frequency terms under zipf(1.1)%30k (df ≈ 0.7%/0.35%/
#: 0.15%/0.07% of docs) — realistic BM25 query terms. Head terms
#: (t12-class, df ≈ 60%) are the measured stopword caveat: a panel of
#: corpus-frequency terms degrades serving toward a corpus scan
#: because "pruned to the matched postings" IS most of the index then
#: (first measured run; kept in SCALE.md as the operational note).
QUERY_TERMS = ["t997", "t2003", "t5001", "t9999"]
DIM = 64
N_RUNS = 3


def _spark():
    from lens_spark.session import get_spark

    spark = get_spark("lens_crossover")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _gen_docs(spark, n: int, path: str) -> None:
    """n docs, 50-250 tokens each, zipf(1.1)-ish over a 30k vocab —
    realistic lengths and a realistic head-heavy term distribution
    (the r11 toy corpus's defect was 31 distinct terms total)."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rng = np.random.default_rng(1009 + int(pdf["id"].iloc[0]))
            out = []
            for i in pdf["id"]:
                ln = int(rng.integers(50, 251))
                ids = rng.zipf(1.1, size=ln * 3) % VOCAB
                ids = ids[:ln] if len(ids) >= ln else ids
                out.append(" ".join(f"t{k}" for k in ids))
            yield pd.DataFrame({"id": pdf["id"], "text": out})

    (spark.range(n).repartition(32).mapInPandas(gen, "id long, text string")
     .write.mode("overwrite").parquet(path))


def _gen_vecs(spark, n: int, path: str) -> None:
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rng = np.random.default_rng(2017 + int(pdf["id"].iloc[0]))
            vecs = rng.standard_normal((len(pdf), DIM)).astype("float32")
            yield pd.DataFrame({"vec_id": pdf["id"],
                                "embedding": list(map(list, vecs))})

    (spark.range(n).repartition(32)
     .mapInPandas(gen, "vec_id long, embedding array<float>")
     .write.mode("overwrite").parquet(path))


def _prepare(family: str, n: int) -> tuple[str, str]:
    """Generate corpus + build index once; reuse across runs."""
    corpus = f"{WORK}/{family}_corpus_{n}.parquet"
    idx = f"{WORK}/{family}_idx_{n}"
    spark = _spark()
    if not os.path.exists(f"{corpus}/_SUCCESS"):
        (_gen_docs if family == "postings" else _gen_vecs)(spark, n, corpus)
    if not os.path.exists(f"{idx}/model.json"):
        df = spark.read.parquet(corpus)
        t0 = time.perf_counter()
        if family == "postings":
            from lens_spark.operators.ranking import postings_index_build

            postings_index_build(df, idx, id_col="id", text_col="text")
        else:
            from lens_spark.operators.similarity import ivfpq_index_build

            ivfpq_index_build(df, idx, id_col="vec_id",
                              vec_col="embedding", dim=DIM, nlist=16,
                              m=8, nbits=6, train_size=2048)
        build_s = time.perf_counter() - t0
        with open(f"{idx}/_build_seconds", "w") as fh:
            fh.write(str(build_s))
    spark.stop()
    return corpus, idx


def _one(family: str, n: int) -> None:
    """One fresh process: calibrate, then time inline and served
    (warm-up run each, N_RUNS timed medians)."""
    from bench import _time_calibration

    corpus_path = f"{WORK}/{family}_corpus_{n}.parquet"
    idx = f"{WORK}/{family}_idx_{n}"
    spark = _spark()
    corpus = spark.read.parquet(corpus_path)

    if family == "postings":
        from lens_spark.operators.ranking import (
            bm25_score,
            postings_index_search,
        )

        panel = spark.createDataFrame([(0, " ".join(QUERY_TERMS))],
                                      "qid long, qtext string")

        def inline():
            return bm25_score(corpus, "id", "text", QUERY_TERMS, limit=10)

        def served():
            return postings_index_search(spark, panel, idx, id_col="qid",
                                         text_col="qtext", k=10)
    else:
        import numpy as np

        from lens_spark.operators.similarity import (
            ivfpq_index_search,
            ivfpq_topk,
        )

        meta = json.load(open(f"{idx}/model.json"))
        cents, books = meta["centroids"], meta["books"]
        rng = np.random.default_rng(4099)
        panel = spark.createDataFrame(
            [(1_000_000 + i,
              [float(x) for x in rng.standard_normal(DIM)])
             for i in range(5)], "vec_id long, embedding array<float>")
        panel = panel.localCheckpoint(eager=True)

        def inline():
            # pre-fit model: isolates encode-whole-corpus-per-panel
            # (inline's true marginal cost) from the one-time fit
            return ivfpq_topk(corpus, panel, id_col="vec_id",
                              vec_col="embedding", dim=DIM, k=10,
                              nlist=16, nprobe=4, m=8, nbits=6,
                              centroids=cents, codebooks=books,
                              exclude_self=False)

        def served():
            return ivfpq_index_search(spark, idx, panel, id_col="vec_id",
                                      vec_col="embedding", k=10, nprobe=4,
                                      exclude_self=False)

    cal = statistics.median(_time_calibration(spark, 3))
    out = {"family": family, "n": n, "cal": round(cal, 3)}
    for name, fn in (("inline", inline), ("served", served)):
        fn().write.format("noop").mode("overwrite").save()  # warm-up
        samples = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(samples), 3)
        out[name + "_min"] = round(min(samples), 3)
    try:
        out["build"] = round(float(open(f"{idx}/_build_seconds").read()), 3)
    except OSError:
        pass
    spark.stop()
    print("CROSSOVER " + json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["postings", "ivfpq"],
                    default="postings")
    ap.add_argument("--sizes", default="5000,20000,80000,320000")
    ap.add_argument("--one", nargs=2, metavar=("FAMILY", "N"))
    args = ap.parse_args()
    if args.one:
        _one(args.one[0], int(args.one[1]))
        return
    os.makedirs(WORK, exist_ok=True)
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    for n in sizes:
        _prepare(args.family, n)
        # fresh process per size: no cross-size JVM heap history
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             args.family, str(n)],
            capture_output=True, text=True, cwd=REPO)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("CROSSOVER ")]
        if not line:
            print(f"size {n} FAILED:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
            continue
        row = json.loads(line[0][len("CROSSOVER "):])
        rows.append(row)
        print(json.dumps(row))
    print(json.dumps({"family": args.family, "rows": rows}))


if __name__ == "__main__":
    main()
