"""lens_spark.maintenance — the one nightly job over every persistent
index family (discover → classify by layout → dispatch each family's
compactor), plus its skip/recover/dry-run behavior."""

from __future__ import annotations

import os

import pytest


def _mk_fp_index(spark, path):
    from lens_spark.operators.dedup import dedup_incremental

    for ids in ([(1, "a"), (2, "b")], [(3, "c"), (4, "d")]):
        df = spark.createDataFrame(ids, "id long, text string")
        dedup_incremental(df, path, columns=["id", "text"]).count()


def _mk_band_index(spark, path):
    from lens_spark.operators.dedup import neardup_incremental

    kw = dict(num_hashes=16, ngram=3, band_size=4, threshold=0.5)
    for i, txt in enumerate(["the quick brown fox jumps over the lazy dog",
                             "pack my box with five dozen liquor jugs"]):
        df = spark.createDataFrame([(i, txt)], "id long, text string")
        neardup_incremental(df, path, "id", "text", **kw).count()


def _mk_ivfpq_index(spark, path):
    import random

    from lens_spark.operators.similarity import ivfpq_index_build

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(48)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ivfpq_index_build(emb, path, id_col="vec_id", vec_col="embedding",
                      dim=8, nlist=2, m=4, nbits=4)


def _mk_quota_index(spark, tmp_path, path):
    import pandas as pd

    from lens_spark.streaming import read_file_stream, run_stream_quota

    src = tmp_path / "quota_src"
    os.makedirs(src)
    pd.DataFrame({"dom": ["a", "a", "b"], "id": [1, 2, 3],
                  "score": [1, 2, 3]}).to_parquet(src / "f1.parquet")
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "f1.parquet"))
    run_stream_quota(stream, str(tmp_path / "quota_landed"), path,
                     keys=["dom"], n=2, order_by="score", tiebreak=["id"])


def test_compact_all_discovers_classifies_and_compacts(spark, tmp_path):
    """One sweep over a mixed index root: every family is found (at
    varying depth, never descending INTO an index), classified from
    its on-disk layout, and deep-cleaned by its own compactor; the
    compacted fingerprint index still recognizes previously-accepted
    rows (data preserved, not just files moved)."""
    from lens_spark.maintenance import compact_all, detect_index_kind
    from lens_spark.operators.dedup import dedup_incremental

    root = tmp_path / "indexes"
    _mk_fp_index(spark, str(root / "fp_idx"))
    _mk_band_index(spark, str(root / "nd_idx"))
    _mk_ivfpq_index(spark, str(root / "nested" / "deeper" / "ivf_idx"))
    _mk_quota_index(spark, tmp_path, str(root / "quota_idx"))

    report = compact_all(spark, str(root))
    kinds = {os.path.basename(p): v.get("kind") for p, v in report.items()}
    assert kinds == {"fp_idx": "fingerprint", "nd_idx": "band",
                     "ivf_idx": "ivfpq", "quota_idx": "quota"}
    for p, stats in report.items():
        assert "error" not in stats and "skipped" not in stats, (p, stats)
        assert stats["files_after"] <= stats["files_before"], (p, stats)
    # the fp index still holds its accepted fingerprints post-compact
    replay = spark.createDataFrame([(1, "a"), (9, "new")],
                                   "id long, text string")
    out = dedup_incremental(replay, str(root / "fp_idx"),
                            columns=["id", "text"], update_index=False)
    assert {r.id for r in out.collect()} == {9}
    # detect alone agrees with the sweep
    assert detect_index_kind(spark, str(root / "nd_idx")) == "band"


def test_compact_all_skips_locked_and_reports_errors(spark, tmp_path):
    """A live writer lease skips (never blocks or corrupts) that index
    only; a directory that looks index-ish but has an unknown parts
    schema is reported as an error; the rest of the sweep proceeds."""
    from lens_spark.maintenance import compact_all

    root = tmp_path / "mixed"
    _mk_fp_index(spark, str(root / "ok_idx"))
    _mk_fp_index(spark, str(root / "busy_idx"))
    open(root / "busy_idx" / "_writer.lock", "w").write("")
    # unknown family: a parts/ dataset none of the readers own
    weird = root / "weird_idx"
    spark.createDataFrame([(1,)], "z long").write.parquet(
        str(weird / "parts"))

    # bootstrapped but never written: parts/ exists, no data yet
    os.makedirs(root / "empty_idx" / "parts")

    report = compact_all(spark, str(root))
    by_name = {os.path.basename(p): v for p, v in report.items()}
    assert by_name["ok_idx"]["kind"] == "fingerprint"
    assert by_name["busy_idx"] == {"skipped": "locked"}
    assert by_name["empty_idx"] == {"skipped": "empty"}
    assert "matches no known index family" in by_name["weird_idx"]["error"]


def test_compact_any_recovers_a_crashed_swap_first(spark, tmp_path):
    """An index whose last rewrite crashed between the two renames
    (parts/ missing, parts.old + parts.migrating present) is rolled
    forward BEFORE classification, then compacted normally — the sweep
    repairs, never refuses, the recoverable window."""
    import shutil

    from lens_spark.maintenance import compact_any

    idx = tmp_path / "crashed"
    _mk_fp_index(spark, str(idx))
    parts = idx / "parts"
    shutil.move(str(parts), str(parts) + ".old")
    shutil.copytree(str(parts) + ".old", str(parts) + ".migrating")
    stats = compact_any(spark, str(idx))
    assert stats["kind"] == "fingerprint"
    assert parts.exists()
    assert not (idx / "parts.old").exists()
    assert not (idx / "parts.migrating").exists()


def test_discover_respects_depth_and_dry_run(spark, tmp_path):
    from lens_spark.maintenance import compact_all, discover_indexes

    root = tmp_path / "deep"
    _mk_fp_index(spark, str(root / "a" / "b" / "c" / "idx"))
    assert discover_indexes(spark, str(root), max_depth=2) == []
    found = discover_indexes(spark, str(root), max_depth=4)
    assert [os.path.basename(p) for p in found] == ["idx"]
    report = compact_all(spark, str(root), dry_run=True)
    (stats,) = report.values()
    assert stats == {"kind": "fingerprint", "dry_run": True}


def test_dry_run_sweep_reports_health_sidecars(spark, tmp_path):
    """r14: the nightly sweep's dry-run doubles as the fleet's index
    health report — O(1) sidecar observables only. An IVFADC index
    with appends reports its drift triggers; a postings index reports
    its maintained row stat; a streamed index reports its last ingest
    batch; families/indexes without a sidecar simply don't carry the
    keys (never an error)."""
    import random

    from lens_spark.maintenance import compact_all
    from lens_spark.operators.ranking import postings_index_build
    from lens_spark.operators.similarity import ivfpq_index_append
    from lens_spark.streaming import _write_ingest_marker

    root = tmp_path / "fleet"
    vidx = str(root / "vidx")
    _mk_ivfpq_index(spark, vidx)
    rng = random.Random(3)
    ivfpq_index_append(
        spark.createDataFrame(
            [(1000 + i, [rng.uniform(-1, 1) for _ in range(8)])
             for i in range(8)], "vec_id long, embedding array<float>"),
        vidx, id_col="vec_id", vec_col="embedding")
    pidx = str(root / "pidx")
    postings_index_build(
        spark.createDataFrame([(1, "spark hash join"), (2, "spark")],
                              "id long, text string"),
        pidx, id_col="id", text_col="text")
    _write_ingest_marker(spark, pidx, 7)
    _mk_fp_index(spark, str(root / "fp_idx"))

    report = compact_all(spark, str(root), dry_run=True)
    v = report[vidx]
    assert v["kind"] == "ivfpq" and "drift" in v
    assert v["drift"]["appended_frac"] > 0
    assert v["drift"]["err_ratio"] is not None
    p = report[pidx]
    assert p["kind"] == "postings" and p["n_postings"] > 0
    assert p["last_ingest_batch"] == 7
    f = report[str(root / "fp_idx")]
    assert f == {"kind": "fingerprint", "dry_run": True}


def test_detect_rejects_non_index(spark, tmp_path):
    """The empty case raises the TYPED EmptyIndexError — compact_all
    skips on the type, so a future rewording of the message can never
    reclassify empty indexes as sweep errors (r11 advice)."""
    from lens_spark.errors import EmptyIndexError
    from lens_spark.maintenance import detect_index_kind

    empty = tmp_path / "not_an_index"
    os.makedirs(empty)
    with pytest.raises(EmptyIndexError):
        detect_index_kind(spark, str(empty))


def test_compact_any_retries_classification_once_on_race(spark, tmp_path,
                                                         monkeypatch):
    """compact_any releases the recovery lease before classification;
    a concurrent writer staging parts/ aside in that gap makes
    detection raise the typed InterruptedRewriteError. The sweep
    retries recover+detect ONCE instead of reporting a healthy index
    as an error (r11 advice). Simulated by a detect wrapper that
    raises on its first call only."""
    import lens_spark.maintenance as m
    from lens_spark.errors import InterruptedRewriteError

    idx = tmp_path / "raced"
    _mk_fp_index(spark, str(idx))
    real_detect = m.detect_index_kind
    calls = {"n": 0}

    def flaky_detect(sp, path):
        calls["n"] += 1
        if calls["n"] == 1:
            raise InterruptedRewriteError("simulated concurrent swap")
        return real_detect(sp, path)

    monkeypatch.setattr(m, "detect_index_kind", flaky_detect)
    stats = m.compact_any(spark, str(idx))
    assert stats["kind"] == "fingerprint"
    assert calls["n"] == 2


def test_compact_any_drop_replay_duplicates_reclaims_postings(spark,
                                                              tmp_path):
    """kwargs pass through compact_any: a replayed postings append
    leaves byte-identical rows; drop_replay_duplicates=True reclaims
    them (row count returns to the pre-replay value) and search
    results are unchanged throughout."""
    from lens_spark.maintenance import compact_any
    from lens_spark.operators.ranking import (
        postings_index_append,
        postings_index_build,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "id long, text string")
    idx = str(tmp_path / "pidx_dupes")
    postings_index_build(corpus.filter("id = 1"), idx, id_col="id",
                         text_col="text")
    batch = corpus.filter("id = 2")
    postings_index_append(batch, idx, id_col="id", text_col="text")
    postings_index_append(batch, idx, id_col="id", text_col="text")
    n_with_dupes = spark.read.parquet(f"{idx}/parts").count()
    stats = compact_any(spark, idx, drop_replay_duplicates=True)
    assert stats["kind"] == "postings"
    n_after = spark.read.parquet(f"{idx}/parts").count()
    assert n_after < n_with_dupes
    # doc 2 contributes only its build-known term "beta": exactly one
    # surviving posting row for it
    assert n_after == 3  # doc1: alpha+beta, doc2: beta


def _pcorpus(spark, upto):
    rows = [(1, "spark shuffle spark join"),
            (2, "hash join hash join hash"),
            (3, "quantum physics lecture notes"),
            (4, "spark hash quantum")][:upto]
    return spark.createDataFrame(rows, "id long, text string")


def _pserve(spark, idx, qtext="spark hash quantum"):
    from lens_spark.operators.ranking import postings_index_search

    panel = spark.createDataFrame([(1, qtext)], "qid long, qtext string")
    return {(r.neighbor_id, r.bm25, r.rank)
            for r in postings_index_search(spark, panel, idx, id_col="qid",
                                           text_col="qtext", k=10).collect()}


def test_rebuild_index_postings_refreshes_frozen_stats(spark, tmp_path):
    """rebuild_index (r11 verdict #6): the one-call honest refresh the
    builders' in-place refusal prescribes — fresh-path build + atomic
    publish + old-path reclaim. After the rebuild over the grown
    corpus, serving equals a fresh build (terms the old index could
    not retrieve now score), and no staging/trash dirs remain."""
    from lens_spark.maintenance import rebuild_index
    from lens_spark.operators.ranking import postings_index_build

    idx = str(tmp_path / "idx")
    postings_index_build(_pcorpus(spark, 2), idx, id_col="id",
                         text_col="text")
    # 'quantum' unknown to the v1 stats: unretrievable by design
    assert not {d for d, *_ in _pserve(spark, idx)} & {3}
    full = _pcorpus(spark, 4)
    stats = rebuild_index(
        spark, idx,
        lambda p: postings_index_build(full, p, id_col="id",
                                       text_col="text"))
    assert stats["n_docs"] == 4
    fresh = str(tmp_path / "fresh")
    postings_index_build(full, fresh, id_col="id", text_col="text")
    assert _pserve(spark, idx) == _pserve(spark, fresh)
    assert {3, 4} <= {d for d, *_ in _pserve(spark, idx)}
    assert not os.path.exists(idx + ".rebuild")
    assert not os.path.exists(idx + ".old")
    # writers are not blocked afterwards (the lease handoff released)
    from lens_spark.operators.ranking import postings_index_append
    postings_index_append(_pcorpus(spark, 2).filter("id = 1"), idx,
                          id_col="id", text_col="text")


def test_rebuild_index_crash_mid_build_keeps_old_servable(spark, tmp_path):
    """A build_fn that dies (or commits nothing) leaves the live index
    byte-untouched and still serving; the retry cleans the stale
    staging and succeeds."""
    from lens_spark.errors import LensError
    from lens_spark.maintenance import rebuild_index
    from lens_spark.operators.ranking import postings_index_build

    idx = str(tmp_path / "idx")
    postings_index_build(_pcorpus(spark, 2), idx, id_col="id",
                         text_col="text")
    before = _pserve(spark, idx, "spark hash")
    with pytest.raises(RuntimeError, match="boom"):
        rebuild_index(spark, idx, lambda p: (_ for _ in ()).throw(
            RuntimeError("boom")))
    assert _pserve(spark, idx, "spark hash") == before

    def half_build(p):  # writes parts but never commits model.json
        full = _pcorpus(spark, 4)
        postings_index_build(full, p, id_col="id", text_col="text")
        os.remove(os.path.join(p, "model.json"))

    with pytest.raises(LensError, match="no committed index"):
        rebuild_index(spark, idx, half_build)
    assert _pserve(spark, idx, "spark hash") == before
    full = _pcorpus(spark, 4)
    rebuild_index(spark, idx, lambda p: postings_index_build(
        full, p, id_col="id", text_col="text"))
    assert {3, 4} <= {d for d, *_ in _pserve(spark, idx)}


def test_rebuild_index_crash_between_renames_rolls_forward(spark,
                                                           tmp_path):
    """The narrowest crash window: staging committed, the live index
    renamed aside, process dies before the second rename. The next
    rebuild_index call rolls the committed rebuild FORWARD (it had
    fully committed), reclaims the trash, clears the dead planted
    lease so writers need not wait out the stale window — and then
    runs its own rebuild normally."""
    import shutil

    from lens_spark.maintenance import _recover_rebuild, rebuild_index
    from lens_spark.operators.ranking import (
        postings_index_append,
        postings_index_build,
    )

    import time

    from lens_spark.errors import ConcurrentIndexWriterError

    idx = str(tmp_path / "idx")
    postings_index_build(_pcorpus(spark, 2), idx, id_col="id",
                         text_col="text")
    # simulate: committed staging (with the planted lease), live index
    # staged aside, crash before rename #2
    full = _pcorpus(spark, 4)
    postings_index_build(full, idx + ".rebuild", id_col="id",
                         text_col="text")
    open(idx + ".rebuild/_writer.lock", "w").close()
    shutil.move(idx, idx + ".old")

    # while the planted lease is FRESH the handoff is owned by a live
    # rebuild (recovery runs before any lock can be taken on the
    # missing index path) — recovery must refuse, not race the
    # owner's rename pair
    with pytest.raises(ConcurrentIndexWriterError, match="live rebuild"):
        _recover_rebuild(spark, idx)
    # a CRASHED owner's lease ages past the stale window; then recover
    old = time.time() - 4000
    os.utime(idx + ".rebuild/_writer.lock", (old, old))
    _recover_rebuild(spark, idx)
    assert os.path.exists(idx) and not os.path.exists(idx + ".old")
    assert not os.path.exists(idx + ".rebuild")
    assert {3, 4} <= {d for d, *_ in _pserve(spark, idx)}
    # the dead planted lease was cleared: an append acquires at once
    postings_index_append(_pcorpus(spark, 2).filter("id = 1"), idx,
                          id_col="id", text_col="text")


def test_rebuild_index_ivfpq_and_discovery_skips_staging(spark, tmp_path):
    """rebuild_index is family-agnostic (the staging/commit protocol
    never reads parts schemas): an IVFADC index rebuilds with a new
    model the same one call — and the maintenance walk neither
    reports nor descends into a mid-handoff .rebuild/.old sibling."""
    import random

    from lens_spark.maintenance import discover_indexes, rebuild_index
    from lens_spark.operators.similarity import (
        ivfpq_index_build,
        ivfpq_index_search,
    )

    root = tmp_path / "root"
    idx = str(root / "vidx")
    _mk_ivfpq_index(spark, idx)
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(96)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    rebuild_index(spark, idx, lambda p: ivfpq_index_build(
        emb, p, id_col="vec_id", vec_col="embedding", dim=8, nlist=3,
        m=4, nbits=4))
    got = ivfpq_index_search(spark, idx, emb.filter("vec_id < 2"),
                             id_col="vec_id", vec_col="embedding", k=5,
                             nprobe=3)
    assert got.count() == 10  # vectors only in the NEW corpus retrieve
    # a mid-handoff sibling is invisible to the sweep
    _mk_fp_index(spark, str(root / "fp_idx.rebuild"))
    _mk_fp_index(spark, str(root / "fp_idx.old"))
    found = discover_indexes(spark, str(root), max_depth=3)
    assert [os.path.basename(p) for p in found] == ["vidx"]


def test_rebuild_migrates_codes_only_index_to_store_vectors(
        spark, tmp_path):
    """The upgrade path for r13-and-earlier IVFADC indexes (codes
    only): one rebuild_index call with a store_vectors=True build_fn.
    Before: rerank without rerank_corpus refuses loudly; after: the
    exact re-rank serves from the index's own probed cells, appends
    follow the new flag, and the old index served reads throughout
    (the swap is two renames)."""
    import random

    from lens_spark.errors import LensError
    from lens_spark.maintenance import rebuild_index
    from lens_spark.operators.similarity import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_search,
    )

    rng = random.Random(21)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)],
        "vec_id long, embedding array<float>")
    idx = str(tmp_path / "vidx")
    ivfpq_index_build(emb.filter("vec_id < 48"), idx, id_col="vec_id",
                      vec_col="embedding", dim=8, nlist=4, m=4, nbits=6)
    queries = emb.filter("vec_id < 3")

    def serve(**kw):
        return ivfpq_index_search(spark, idx, queries, id_col="vec_id",
                                  vec_col="embedding", k=5, nprobe=4,
                                  rerank=20, **kw)

    with pytest.raises(LensError, match="store_vectors"):
        serve().collect()
    want = {(r.query_id, r.neighbor_id, r.score)
            for r in serve(rerank_corpus=emb).collect()}

    rebuild_index(spark, idx, lambda p: ivfpq_index_build(
        emb.filter("vec_id < 48"), p, id_col="vec_id",
        vec_col="embedding", dim=8, nlist=4, m=4, nbits=6,
        store_vectors=True))
    assert {(r.query_id, r.neighbor_id, r.score)
            for r in serve().collect()} == want
    # appends follow the rebuilt index's flag (vectors land too): an
    # appended vector queried against itself is retrievable through
    # the stored-vector re-rank with no corpus table anywhere
    ivfpq_index_append(emb.filter("vec_id >= 48"), idx,
                       id_col="vec_id", vec_col="embedding")
    assert "vec" in spark.read.parquet(f"{idx}/parts").columns
    hit = ivfpq_index_search(
        spark, idx, emb.filter("vec_id = 50"), id_col="vec_id",
        vec_col="embedding", k=3, nprobe=4, rerank=10,
        exclude_self=False)
    assert (50, 50) in {(r.query_id, r.neighbor_id)
                        for r in hit.collect()}


def test_recover_rebuild_raced_skeleton_rolls_old_back(spark, tmp_path):
    """The r12-advice race: between the swap's two renames the index
    path does not exist, so a concurrent writer's _index_writer_lock
    (which mkdirs the path before createNewFile) can recreate it as a
    MODEL-LESS skeleton. Recovery must NOT treat the skeleton as a
    live index and reclaim .old — that deletes the only complete
    copy. It waits out a fresh skeleton lease, then drops the
    skeleton, restores .old, and clears the dead lock that traveled
    with it (the roll-back twin of the roll-forward branch's
    lock-clearing)."""
    import shutil
    import time

    from lens_spark.errors import ConcurrentIndexWriterError
    from lens_spark.maintenance import _recover_rebuild
    from lens_spark.operators.ranking import (
        postings_index_append,
        postings_index_build,
    )

    idx = str(tmp_path / "idx")
    postings_index_build(_pcorpus(spark, 2), idx, id_col="id",
                         text_col="text")
    before = _pserve(spark, idx, "spark hash")
    # crash between the renames, then the racer recreates the path
    shutil.move(idx, idx + ".old")
    os.makedirs(idx)
    open(idx + "/_writer.lock", "w").close()
    # the racer's lease is fresh: recovery waits, never deletes it
    with pytest.raises(ConcurrentIndexWriterError):
        _recover_rebuild(spark, idx)
    assert os.path.exists(idx + ".old/model.json")
    old = time.time() - 4000
    os.utime(idx + "/_writer.lock", (old, old))
    _recover_rebuild(spark, idx)
    assert os.path.exists(idx + "/model.json")
    assert not os.path.exists(idx + ".old")
    assert not os.path.exists(idx + "/_writer.lock")
    assert _pserve(spark, idx, "spark hash") == before
    # writers acquire at once (the dead lock was cleared)
    postings_index_append(_pcorpus(spark, 2).filter("id = 1"), idx,
                          id_col="id", text_col="text")


def test_recover_rebuild_nested_swap_keeps_index_alive(spark, tmp_path):
    """The worst shape of the same race: rename #2 lands the staging
    dir NESTED inside the racer's skeleton (Hadoop rename into an
    existing dir). The sibling .rebuild is gone, .old holds the only
    complete top-level index — recovery drops the skeleton (nested
    rebuild included; a rebuild can rerun, a lost index cannot) and
    rolls .old back."""
    import shutil

    from lens_spark.maintenance import _recover_rebuild
    from lens_spark.operators.ranking import postings_index_build

    idx = str(tmp_path / "idx")
    postings_index_build(_pcorpus(spark, 2), idx, id_col="id",
                         text_col="text")
    before = _pserve(spark, idx, "spark hash")
    staging = idx + ".rebuild"
    postings_index_build(_pcorpus(spark, 4), staging, id_col="id",
                         text_col="text")
    shutil.move(idx, idx + ".old")
    os.makedirs(idx)  # the racer's skeleton (its lock already released)
    shutil.move(staging, os.path.join(idx, os.path.basename(staging)))
    _recover_rebuild(spark, idx)
    assert os.path.exists(idx + "/model.json")
    assert not os.path.exists(idx + ".old")
    assert _pserve(spark, idx, "spark hash") == before


def test_wait_out_skeleton_lease(spark, tmp_path):
    """r13 advice (medium): before deleting a raced skeleton the
    inline nested-swap repair must wait out a FRESH lease there (a
    live concurrent writer's), exactly like _recover_rebuild — the
    old code deleted it unconditionally. Unit-pins the extracted
    guard: absent → pass, fresh → typed refusal after the deadline,
    stale → pass, released mid-wait → pass."""
    import threading
    import time

    from lens_spark.errors import ConcurrentIndexWriterError
    from lens_spark.maintenance import _wait_out_skeleton_lease

    idx = str(tmp_path / "skel")
    os.makedirs(idx)
    lock = os.path.join(idx, "_writer.lock")
    _wait_out_skeleton_lease(spark, idx, "boom", timeout_sec=0.5)

    open(lock, "w").close()
    with pytest.raises(ConcurrentIndexWriterError, match="boom"):
        _wait_out_skeleton_lease(spark, idx, "boom", timeout_sec=0.4)

    old = time.time() - 4000
    os.utime(lock, (old, old))
    _wait_out_skeleton_lease(spark, idx, "boom", timeout_sec=0.5)

    os.utime(lock, None)  # fresh again
    t = threading.Timer(0.5, os.remove, [lock])
    t.start()
    _wait_out_skeleton_lease(spark, idx, "boom", timeout_sec=10.0)
    t.join()


def _all_part_files(parts: str) -> list:
    out = []
    for dirpath, _dirs, files in os.walk(parts):
        out.extend(os.path.join(dirpath, f) for f in files
                   if not f.startswith(("_", ".")))
    return sorted(out)


def test_ivfpq_append_refuses_rename_gap_skeleton(spark, tmp_path,
                                                  monkeypatch):
    """r13 advice (medium), writer side: ivfpq_index_append reads
    model.json BEFORE locking, so a lock acquired on a rebuild swap's
    rename-gap skeleton used to land the batch's vectors in a dir the
    swap repair then silently deletes — while the streaming checkpoint
    advanced past the batch. The append must re-verify the model UNDER
    the lock and fail loudly with nothing written."""
    import contextlib
    import random
    import shutil

    import lens_spark.operators.dedup as dedup_mod
    from lens_spark.errors import LensError
    from lens_spark.operators.similarity import ivfpq_index_append

    idx = str(tmp_path / "vidx")
    _mk_ivfpq_index(spark, idx)
    files_before = _all_part_files(f"{idx}/parts")
    model_stash = str(tmp_path / "model.stash")

    real_lock = dedup_mod._index_writer_lock

    @contextlib.contextmanager
    def racing_lock(s, path, **kw):
        with real_lock(s, path, **kw):
            if os.path.exists(f"{path}/model.json"):
                # the swap's rename gap: the path we locked is a
                # model-less skeleton
                shutil.move(f"{path}/model.json", model_stash)
            yield

    monkeypatch.setattr(dedup_mod, "_index_writer_lock", racing_lock)
    rng = random.Random(11)
    batch = spark.createDataFrame(
        [(1000 + i, [rng.uniform(-1, 1) for _ in range(8)])
         for i in range(4)], "vec_id long, embedding array<float>")
    with pytest.raises(LensError, match="rebuild_index swap owns"):
        ivfpq_index_append(batch, idx, id_col="vec_id",
                           vec_col="embedding")
    assert _all_part_files(f"{idx}/parts") == files_before, \
        "nothing may land in the skeleton"
    monkeypatch.setattr(dedup_mod, "_index_writer_lock", real_lock)
    shutil.move(model_stash, f"{idx}/model.json")
    assert ivfpq_index_append(batch, idx, id_col="vec_id",
                              vec_col="embedding") == 4


def test_ivfpq_append_reencodes_under_swapped_model(spark, tmp_path,
                                                    monkeypatch):
    """The completed-rebuild flavor of the same race: a rebuild that
    finished between the pre-lock model read and the lease swapped in
    a NEW model — codes encoded under the old one would silently
    mis-rank. The append must re-encode under the live model: a raced
    append and a clean replay of the same batch store byte-identical
    (id, code, cell) rows."""
    import contextlib
    import random
    import shutil

    import lens_spark.operators.dedup as dedup_mod
    from lens_spark.operators.similarity import (
        ivfpq_index_append,
        ivfpq_index_build,
    )

    idx = str(tmp_path / "vidx")
    _mk_ivfpq_index(spark, idx)
    # a different committed index = the post-rebuild state (different
    # corpus → different centroids/codebooks, same dim/m/nbits)
    idx2 = str(tmp_path / "vidx2")
    rng = random.Random(9)
    emb2 = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(48)],
        "vec_id long, embedding array<float>")
    ivfpq_index_build(emb2, idx2, id_col="vec_id", vec_col="embedding",
                      dim=8, nlist=3, m=4, nbits=4)

    real_lock = dedup_mod._index_writer_lock
    raced = {"done": False}

    @contextlib.contextmanager
    def racing_lock(s, path, **kw):
        with real_lock(s, path, **kw):
            if not raced["done"] and path == idx:
                raced["done"] = True
                shutil.copy(f"{idx2}/model.json", f"{idx}/model.json")
                # keep the Hadoop local-FS checksum sidecar consistent
                for crc in (".model.json.crc",):
                    if os.path.exists(f"{idx2}/{crc}"):
                        shutil.copy(f"{idx2}/{crc}", f"{idx}/{crc}")
                    elif os.path.exists(f"{idx}/{crc}"):
                        os.remove(f"{idx}/{crc}")
                shutil.rmtree(f"{idx}/parts")
                shutil.copytree(f"{idx2}/parts", f"{idx}/parts")
            yield

    monkeypatch.setattr(dedup_mod, "_index_writer_lock", racing_lock)
    rng = random.Random(13)
    batch = spark.createDataFrame(
        [(2000 + i, [rng.uniform(-1, 1) for _ in range(8)])
         for i in range(6)], "vec_id long, embedding array<float>")
    assert ivfpq_index_append(batch, idx, id_col="vec_id",
                              vec_col="embedding") == 6  # raced
    assert ivfpq_index_append(batch, idx, id_col="vec_id",
                              vec_col="embedding") == 6  # clean replay
    per = (spark.read.parquet(f"{idx}/parts")
           .filter("id >= 2000")
           .groupBy("id", "code", "cell").count().collect())
    assert len(per) == 6 and all(r["count"] == 2 for r in per), \
        "the raced append must have encoded under the LIVE model"


def test_recover_rebuild_leaves_crashed_first_build_alone(spark,
                                                          tmp_path):
    """A model-less index dir with NO rebuild siblings is a crashed
    FIRST build's leftover — the builders' own retry contract owns it;
    recovery must not touch it."""
    from lens_spark.maintenance import _recover_rebuild
    from lens_spark.operators.ranking import postings_index_build

    idx = str(tmp_path / "idx")
    postings_index_build(_pcorpus(spark, 2), idx, id_col="id",
                         text_col="text")
    os.remove(idx + "/model.json")  # the marker-less leftover
    _recover_rebuild(spark, idx)
    assert os.path.exists(idx + "/parts")  # untouched
    # retrying the build at the same path overwrites the leftover —
    # the builders' documented contract still holds post-recovery
    postings_index_build(_pcorpus(spark, 2), idx, id_col="id",
                         text_col="text")
    assert _pserve(spark, idx, "spark hash")


def _bucket_files(parts: str) -> dict:
    """Data-file names per first-level partition dir (hidden entries
    skipped) — the fixture for 'only the offending dir was rewritten'
    assertions."""
    out = {}
    for d in os.listdir(parts):
        if d.startswith(("_", ".")) or not os.path.isdir(
                os.path.join(parts, d)):
            continue
        out[d] = sorted(f for f in os.listdir(os.path.join(parts, d))
                        if not f.startswith(("_", ".")))
    return out


def test_partition_subset_compaction_touches_only_named_buckets(
        spark, tmp_path):
    """r12 verdict #3: the in-sink compaction path must rewrite ONLY
    the over-threshold bucket dir(s) — every other bucket's files are
    byte-untouched (same names on disk) and serving is identical.
    Also pins that the maintained postings stat survives (no rows
    removed without drop_replay_duplicates) and shrinks correctly
    with it."""
    from lens_spark.operators.dedup import compact_index
    from lens_spark.operators.ranking import (
        _read_postings_stats,
        postings_index_append,
        postings_index_build,
    )

    idx = str(tmp_path / "pidx_subset")
    parts = f"{idx}/parts"
    postings_index_build(_pcorpus(spark, 4), idx, id_col="id",
                         text_col="text")
    batch = spark.createDataFrame([(9, "spark hash")],
                                  "id long, text string")
    postings_index_append(batch, idx, id_col="id", text_col="text")
    postings_index_append(batch, idx, id_col="id", text_col="text")
    before = _bucket_files(parts)
    multi = [d for d, fl in before.items() if len(fl) > 1]
    assert multi, "fixture: the appended buckets hold several files"
    victim = multi[0]
    keep = [d for d in before if d != victim]
    assert keep, "fixture: at least one untouched bucket"
    serve_before = _pserve(spark, idx, "spark hash quantum")
    stat_before = _read_postings_stats(spark, idx)

    stats = compact_index(spark, idx,
                          partitions=[int(victim.split("=")[1])])
    assert stats["partitions"] == [victim]
    after = _bucket_files(parts)
    assert set(after) == set(before)
    assert len(after[victim]) == 1
    for d in keep:
        assert after[d] == before[d], f"{d} was rewritten"
    assert _pserve(spark, idx, "spark hash quantum") == serve_before
    assert _read_postings_stats(spark, idx) == stat_before

    # with drop_replay_duplicates the subset's replay residue is
    # reclaimed and the stat shrinks by exactly the removed rows
    n_before = spark.read.parquet(parts).count()
    stats2 = compact_index(spark, idx,
                           partitions=[int(d.split("=")[1])
                                       for d in multi],
                           drop_replay_duplicates=True)
    n_after = spark.read.parquet(parts).count()
    assert stats2["rows_removed"] == n_before - n_after > 0
    assert _read_postings_stats(spark, idx) == stat_before - \
        stats2["rows_removed"] == n_after
    assert _pserve(spark, idx, "spark hash quantum") == serve_before


def test_partition_subset_compaction_never_lists_full_tree(
        spark, tmp_path):
    """r13 verdict #4: the subset branch must derive the data columns
    from ONE named bucket dir — never ``spark.read.parquet`` on the
    parts ROOT, whose partition discovery lists every file in the
    index inside a streaming micro-batch. Pinned behaviorally: an
    untouched foreign dir with a CONFLICTING partition depth makes any
    full-tree discovery raise, while the subset rewrite of a named
    healthy bucket must still succeed and leave the poisoned dir
    untouched."""
    import shutil

    from lens_spark.operators.dedup import compact_index
    from lens_spark.operators.ranking import (
        postings_index_append,
        postings_index_build,
    )

    idx = str(tmp_path / "pidx_scope")
    parts = f"{idx}/parts"
    postings_index_build(_pcorpus(spark, 4), idx, id_col="id",
                         text_col="text")
    batch = spark.createDataFrame([(9, "spark hash")],
                                  "id long, text string")
    postings_index_append(batch, idx, id_col="id", text_col="text")
    postings_index_append(batch, idx, id_col="id", text_col="text")
    before = _bucket_files(parts)
    victim = next(d for d, fl in before.items() if len(fl) > 1)

    # poison: a deeper-nested leaf in an unrequested bucket — any
    # root-level parquet discovery now fails on conflicting depth
    poison = os.path.join(parts, "pb=999999", "deep=1")
    os.makedirs(poison)
    spark.createDataFrame([(1,)], "x long").coalesce(1) \
        .write.mode("overwrite").parquet(str(tmp_path / "poison_src"))
    src = next(f for f in os.listdir(str(tmp_path / "poison_src"))
               if f.endswith(".parquet"))
    shutil.copy(os.path.join(str(tmp_path / "poison_src"), src),
                os.path.join(poison, src))
    with pytest.raises(Exception, match="[Cc]onflicting"):
        spark.read.parquet(parts).count()

    stats = compact_index(spark, idx,
                          partitions=[int(victim.split("=")[1])])
    assert stats["partitions"] == [victim]
    after = _bucket_files(parts)
    assert len(after[victim]) == 1
    assert os.path.isfile(os.path.join(poison, src)), \
        "the unrequested dir must be untouched"


def test_partition_swap_crash_matrix_and_reader_refusal(spark,
                                                        tmp_path):
    """Per-partition staged swaps have the parts-level crash
    guarantees: readers REFUSE the unsafe window (live dir missing,
    hidden staging present — a plain read would silently see an empty
    bucket: wrong results, not an error), and the next writing call
    rolls the swap forward; post-swap residue is reclaimed."""
    import shutil

    from lens_spark.errors import LensError
    from lens_spark.operators.ranking import (
        postings_index_append,
        postings_index_build,
        postings_index_search,
    )

    idx = str(tmp_path / "pidx_crash")
    parts = f"{idx}/parts"
    postings_index_build(_pcorpus(spark, 4), idx, id_col="id",
                         text_col="text")
    before = _pserve(spark, idx, "spark hash quantum")
    victim = next(d for d in os.listdir(parts) if d.startswith("pb="))
    live = os.path.join(parts, victim)
    tmp = os.path.join(parts, f".{victim}.migrating")
    old = os.path.join(parts, f".{victim}.old")

    # crash between the renames: tmp complete, live missing
    shutil.copytree(live, tmp)
    shutil.move(live, old)
    panel = spark.createDataFrame([(1, "spark hash quantum")],
                                  "qid long, qtext string")
    with pytest.raises(LensError, match="interrupted rewrite"):
        postings_index_search(spark, panel, idx, id_col="qid",
                              text_col="qtext", k=10).collect()
    # any writing call recovers (roll forward), then serves as before
    postings_index_append(
        spark.createDataFrame([(8, "spark")], "id long, text string"),
        idx, id_col="id", text_col="text")
    assert os.path.isdir(live) and not os.path.exists(tmp)
    assert not os.path.exists(old)
    assert {d for d, *_ in _pserve(spark, idx, "spark hash quantum")} \
        >= {d for d, *_ in before}

    # crash before the final delete: live + .old residue — benign for
    # readers (live is complete), reclaimed by the next writing call
    shutil.copytree(live, old)
    assert {d for d, *_ in _pserve(spark, idx, "spark hash quantum")} \
        >= {d for d, *_ in before}  # readers never refuse here
    postings_index_append(
        spark.createDataFrame([(7, "spark")], "id long, text string"),
        idx, id_col="id", text_col="text")
    assert not os.path.exists(old)


def test_lease_heartbeat_keeps_slow_single_stage_alive(spark, tmp_path):
    """r12 verdict #7 (the ADVICE residual): a SINGLE Spark stage
    longer than the stale window used to lose its lease mid-build —
    inter-stage refreshes can't fire inside a stage. With the
    heartbeat, a concurrent writer probing a shrunken stale window
    still sees a FRESH lease for the whole critical section; without
    it, the same slow stage gets its live lock broken (the exact
    defect, pinned so the fix is observable)."""
    import time

    from lens_spark.errors import ConcurrentIndexWriterError
    from lens_spark.operators.dedup import (
        _index_writer_lock,
        _lease_heartbeat,
    )

    idx = str(tmp_path / "idx_hb")
    with _index_writer_lock(spark, idx), \
            _lease_heartbeat(spark, idx, interval=0.2):
        time.sleep(1.5)  # the "slow single stage" — past the window
        with pytest.raises(ConcurrentIndexWriterError):
            with _index_writer_lock(spark, idx, stale_after_sec=1.0):
                pass

    # the counterfactual: no heartbeat, same slow stage — the peer's
    # stale-break succeeds and the live holder has lost its lease
    with _index_writer_lock(spark, idx):
        time.sleep(1.5)
        with _index_writer_lock(spark, idx, stale_after_sec=1.0):
            pass  # acquired by breaking the "abandoned" lock
