"""Synthesize a LARGER scale factor from /root/testdata/sf0.1 for the
round-15 scaling datapoint (r14 verdict "Next round" #7) — NOT bench or
oracle data.

The driver's testdata tops out at sf0.1, where ~35-40% of every benched
query is fixed per-job overhead and the 8-vs-32-core ratios bound
overhead, not operator parallelism. This tool replicates sf0.1 K times
(default 10 → "sfx1") into an output dir with the same table layout so
the top queries can be timed at a size where compute dominates. Used
ONLY by the SCALE.md measurement; bench.py and the oracle never read
it.

Replication is deterministic (seeded per copy) and keeps each copy
*textually and vectorially independent* so near-dup/LSH workloads are
not quadratically inflated by self-similar copies:

- documents: doc_id offset per copy; for copies > 0 the WORDS of each
  text are shuffled with Random((copy<<32) ^ doc_id) — token (and so
  unigram-LM / BM25 / vocab) distributions are preserved exactly, but
  word n-gram shingles and MinHash bands decorrelate, so duplicate
  *rates* stay at the sf0.1 level instead of every doc gaining 9 near
  duplicates. n_chars is recomputed (single-space rejoin).
- embeddings: vec_id offset; each copy's vectors are cyclically
  rotated by the copy index (norm- and distribution-preserving, but
  distinct — no exact-duplicate collapse in knn/semdedup).
- fact tables (lineitem/orders/customer/supplier/part/events):
  verbatim copies with all primary/foreign keys offset consistently
  per copy (dims region/nation stay fixed, nationkeys stay in range).
  Value columns are copied verbatim, so e.g. quantile_bin's distinct
  count stays at the sf0.1 level (~583k) and the exact-mode guard
  resolves the same way it does on the bench.

Usage: python tools/make_scaled_sf.py [K] [out_dir]
Defaults: K=10, out_dir=/tmp/sfscale/sfx1
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _offset(table: pa.Table, col: str, step: int, copy: int) -> pa.Table:
    i = table.column_names.index(col)
    arr = pc.add(table.column(col), pa.scalar(step * copy,
                                              type=table.schema.field(col).type))
    return table.set_column(i, table.schema.field(col), arr)


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale/sfx1"
    os.makedirs(out_dir, exist_ok=True)

    tables = {n[:-len(".parquet")]: pq.read_table(os.path.join(SRC, n))
              for n in sorted(os.listdir(SRC)) if n.endswith(".parquet")}

    # key step per table: max(key)+1 so copies never collide
    def step(t, c):
        return int(pc.max(tables[t].column(c)).as_py()) + 1

    steps = {
        "c": step("customer", "c_custkey"),
        "s": step("supplier", "s_suppkey"),
        "p": step("part", "p_partkey"),
        "o": step("orders", "o_orderkey"),
        "e": step("events", "event_id"),
        "u": step("events", "user_id"),
        "d": step("documents", "doc_id"),
        "v": step("embeddings", "vec_id"),
    }

    plan = {
        "region": None, "nation": None,  # fixed dims
        "customer": [("c_custkey", "c")],
        "supplier": [("s_suppkey", "s")],
        "part": [("p_partkey", "p")],
        "orders": [("o_orderkey", "o"), ("o_custkey", "c")],
        "lineitem": [("l_orderkey", "o"), ("l_partkey", "p"),
                     ("l_suppkey", "s")],
        "events": [("event_id", "e"), ("user_id", "u")],
    }

    for name, keyplan in plan.items():
        src = tables[name]
        if keyplan is None:
            pq.write_table(src, os.path.join(out_dir, f"{name}.parquet"))
            continue
        copies = []
        for copy in range(k):
            t = src
            for col, s in keyplan:
                t = _offset(t, col, steps[s], copy)
            copies.append(t)
        pq.write_table(pa.concat_tables(copies),
                       os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {src.num_rows} x {k}", flush=True)

    # documents: word-shuffle per copy
    docs = tables["documents"]
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang")
    sources = docs.column("source")
    copies = []
    for copy in range(k):
        if copy == 0:
            copies.append(docs)
            continue
        new_texts = []
        for did, txt in zip(ids, texts):
            words = (txt or "").split()
            random.Random((copy << 32) ^ did).shuffle(words)
            new_texts.append(" ".join(words))
        nt = pa.array(new_texts, type=docs.schema.field("text").type)
        t = pa.table({
            "doc_id": pc.add(docs.column("doc_id"),
                             pa.scalar(steps["d"] * copy, type=pa.int64())),
            "text": nt,
            "lang": langs,
            "source": sources,
            "n_chars": pc.cast(pc.utf8_length(pc.cast(nt, pa.string())),
                               pa.int64()),
        }).cast(docs.schema)
        copies.append(_offset(docs, "doc_id", steps["d"], copy)
                      .set_column(docs.column_names.index("text"),
                                  docs.schema.field("text"), nt)
                      .set_column(docs.column_names.index("n_chars"),
                                  docs.schema.field("n_chars"),
                                  t.column("n_chars")))
    pq.write_table(pa.concat_tables(copies),
                   os.path.join(out_dir, "documents.parquet"))
    print(f"documents: {docs.num_rows} x {k} (word-shuffled)", flush=True)

    # embeddings: cyclic-rotate vec per copy
    emb = tables["embeddings"]
    vecs = emb.column("embedding").to_pylist()
    copies = []
    for copy in range(k):
        if copy == 0:
            copies.append(emb)
            continue
        rot = [v[copy % len(v):] + v[:copy % len(v)] if v else v
               for v in vecs]
        t = _offset(emb, "vec_id", steps["v"], copy)
        t = t.set_column(emb.column_names.index("embedding"),
                         emb.schema.field("embedding"),
                         pa.array(rot, type=emb.schema.field("embedding").type))
        copies.append(t)
    pq.write_table(pa.concat_tables(copies),
                   os.path.join(out_dir, "embeddings.parquet"))
    print(f"embeddings: {emb.num_rows} x {k} (rotated)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
