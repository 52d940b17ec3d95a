"""Unified maintenance entry point for every persistent index.

Four operator families keep crash-safe on-disk indexes (all built on
the shared ``dedup._staged_swap`` publish protocol and the same writer
lease): the MinHash band / embedding cell indexes
(``neardup_incremental`` family), the exact-fingerprint index
(``dedup_incremental``), the stream-quota count index
(``run_stream_quota``), and the materialized IVFADC code index
(``ivfpq_index_build``). Each appends small files per ingest batch and
each has its own deep-clean compactor. At 100 TB the operational shape
is ONE nightly job over the index root, not four hand-scheduled ones —
this module is that job:

    from lens_spark.maintenance import compact_all
    compact_all(spark, "hdfs:///curation/indexes")

or, from a cron shell::

    python -m lens_spark.maintenance /data/indexes [--dry-run]

Detection is by layout, not registration: an index is any directory
holding a ``parts/`` parquet dataset (plus ``model.json`` for IVFPQ),
and its family is read from the parts schema — the same columns every
reader already depends on. A live writer lease makes ``compact_all``
skip that index and report it, never block or corrupt; an index
mid-crash is rolled forward by the family compactor it dispatches to
(they all recover before rewriting). Discovery walks the Hadoop
FileSystem API, so the same call works on ``hdfs:``/``s3a:`` roots —
a driver-local ``Path.rglob`` would silently see an empty remote tree
(the dataset_exists defect class).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from lens_spark.errors import (
    ConcurrentIndexWriterError,
    EmptyIndexError,
    InterruptedRewriteError,
    LensError,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

#: parts-schema fingerprints, checked in order (model.json-bearing
#: families are resolved by their format field first; quota before
#: fingerprint because both carry pb).
_KIND_COLUMNS = (
    ("ivfpq", {"id", "code", "cell"}),
    ("postings", {"term", "doc", "tf", "dl", "df", "pb"}),
    ("quota", {"kh", "cnt", "pb"}),
    ("band", {"kind", "pb"}),
    ("fingerprint", {"fp", "pb"}),
)

#: model.json "format" → index kind (both dense and sparse retrieval
#: indexes carry a model file beside parts/)
_MODEL_FORMATS = {
    "lens_spark_ivfpq_index": "ivfpq",
    "lens_spark_postings_index": "postings",
}


def detect_index_kind(spark: "SparkSession", index_path: str) -> str:
    """Classify the index at ``index_path`` by its on-disk layout:
    ``ivfpq`` | ``postings`` | ``quota`` | ``band`` | ``fingerprint``.
    Raises ``EmptyIndexError`` for a directory with no ``parts/``
    dataset (typed so sweeps can skip it as benign, never by matching
    message text), ``InterruptedRewriteError`` for a mid-swap index,
    and plain ``LensError`` for a parts schema none of the families
    own. An index whose last rewrite crashed mid-swap (``parts``
    missing but staging dirs present) is still classified when
    ``model.json`` identifies it; otherwise the caller should let
    the family compactor recover it — we refuse with the typed
    interrupted-rewrite error rather than guessing."""
    from lens_spark.operators.dedup import _parts_migration_leftovers
    from lens_spark.sources import dataset_nonempty, read_json_file

    meta = read_json_file(spark, f"{index_path}/model.json")
    if meta is not None:
        fmt = meta.get("format")
        kind = _MODEL_FORMATS.get(str(fmt))
        if kind is None:
            raise LensError(
                f"detect_index_kind: {index_path!r} model.json format "
                f"{fmt!r} matches no known index family.")
        return kind
    parts_path = f"{index_path}/parts"
    if _parts_migration_leftovers(spark, parts_path):
        raise InterruptedRewriteError(
            f"detect_index_kind: {index_path!r} has an interrupted "
            "rewrite (parts/ staged aside); run its family compactor "
            "or any writing call to recover it first.")
    if not dataset_nonempty(spark, parts_path):
        raise EmptyIndexError(
            f"detect_index_kind: {index_path!r} has no parts/ dataset "
            "— not a persistent index (or still empty).")
    cols = set(spark.read.parquet(parts_path).columns)
    for kind, marker in _KIND_COLUMNS:
        if marker <= cols:
            return kind
    raise LensError(
        f"detect_index_kind: {index_path!r} parts schema "
        f"{sorted(cols)} matches no known index family.")


def compact_any(spark: "SparkSession", index_path: str, *,
                drop_replay_duplicates: bool = False, **kwargs) -> dict:
    """Detect the index family at ``index_path`` and run its deep-clean
    compactor. Returns the compactor's stats dict plus ``kind``.

    ``drop_replay_duplicates`` reclaims byte-identical rows left by
    at-least-once streaming replays — routed to every SET-semantics
    family (ivfpq, postings, band, fingerprint) and deliberately NOT
    to the quota index, whose rows are increments: its counts ARE the
    documented at-least-once charge record, and its compactor SUMS.
    Other ``kwargs`` pass through (e.g. ``target_files_per_partition``
    for the pb-layout families); keys a family doesn't accept raise
    TypeError loudly rather than being silently dropped."""
    from lens_spark.operators.dedup import (
        _index_writer_lock,
        _parts_migration_leftovers,
        _parts_pb_migration_recover,
    )

    parts_path = f"{index_path}/parts"
    # A swap crashed between renames: roll it forward under the lease
    # FIRST so detection can read the parts schema (the recovery
    # protocol is family-agnostic; the family compactor will recover
    # again idempotently under its own lease). The recovery lease is
    # released before detection, so a CONCURRENT writer can stage
    # parts/ aside in the gap — retry recover+detect once on the
    # typed interrupted-rewrite error instead of reporting a healthy
    # index as failed.
    kind = None
    for attempt in (0, 1):
        if _parts_migration_leftovers(spark, parts_path):
            with _index_writer_lock(spark, index_path):
                _parts_pb_migration_recover(spark, parts_path)
        try:
            kind = detect_index_kind(spark, index_path)
            break
        except InterruptedRewriteError:
            if attempt:
                raise
    if kind == "ivfpq":
        from lens_spark.operators.similarity import compact_ivfpq_index
        stats = compact_ivfpq_index(
            spark, index_path,
            drop_replay_duplicates=drop_replay_duplicates, **kwargs)
    elif kind == "quota":
        from lens_spark.streaming import compact_quota_index
        stats = compact_quota_index(spark, index_path, **kwargs)
    else:  # band / fingerprint / postings share the pb-layout compactor
        from lens_spark.operators.dedup import compact_index
        stats = compact_index(
            spark, index_path,
            drop_replay_duplicates=drop_replay_duplicates, **kwargs)
    return {"kind": kind, **stats}


def _recover_rebuild(spark: "SparkSession", index_path: str) -> None:
    """Roll a crashed ``rebuild_index`` swap to a consistent state.

    The swap sequence is: build into ``<index>.rebuild`` (committed —
    its ``model.json`` marker is present — before any rename), rename
    ``<index>`` → ``<index>.old``, rename ``.rebuild`` → ``<index>``,
    delete ``.old``. Crash matrix: live index present AND committed
    (its own ``model.json`` at top level) → any leftover ``.old`` is
    post-swap residue, reclaim it; index present but MODEL-LESS with
    rebuild siblings → the raced skeleton (a concurrent writer's
    ``_index_writer_lock`` mkdirs the path inside the rename gap —
    r12 advice; reclaiming ``.old`` here would delete the only
    complete copy): delete the skeleton and restore ``.old`` (or,
    when only a committed ``.rebuild`` remains, roll that forward);
    index missing with a COMMITTED ``.rebuild`` → the crash hit
    between the renames, roll FORWARD; index missing with only
    ``.old`` → roll BACK. A model-less index dir with NO rebuild
    siblings is not ours (a crashed first build) — left alone.
    Idempotent; called by ``rebuild_index`` on entry."""
    import time

    from lens_spark.operators.dedup import INDEX_LOCK_STALE_SEC

    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(index_path).getFileSystem(spark._jsc.hadoopConfiguration())
    idx, staging, trash = (P(index_path), P(index_path + ".rebuild"),
                           P(index_path + ".old"))
    staged_committed = fs.exists(P(index_path + ".rebuild/model.json"))
    trash_committed = fs.exists(P(index_path + ".old/model.json"))
    if fs.exists(idx) and fs.exists(P(f"{index_path}/model.json")):
        if fs.exists(trash):
            fs.delete(trash, True)
        return
    if fs.exists(idx) and not (staged_committed or trash_committed):
        # model-less, no committed rebuild artifacts: a crashed FIRST
        # build's leftover — the builders' own retry contract owns it
        return
    # Recovery necessarily runs BEFORE the lease (acquiring would
    # mkdir the missing index path and erase the crash evidence), so
    # it must not roll a LIVE rebuild's handoff forward: the owning
    # process's lease file travels with the dirs (planted in staging,
    # original in trash). A lease younger than the stale window means
    # the handoff is owned — refuse, don't race the owner's renames
    # (the owner completes in microseconds; a crashed owner's lease
    # ages past the window and recovery then proceeds).
    for p in (P(f"{index_path}.rebuild/_writer.lock"),
              P(f"{index_path}.old/_writer.lock"),
              # the skeleton's own lock: its holder acquired on a
              # dataset-less path (reads fail loudly), but recovery is
              # lazy — wait out a FRESH holder rather than deleting a
              # live lease out from under it
              P(f"{index_path}/_writer.lock")):
        try:
            age = time.time() - fs.getFileStatus(p).getModificationTime() / 1000.0
        except Exception:  # noqa: BLE001 — no lock file there
            continue
        if age <= INDEX_LOCK_STALE_SEC:
            raise ConcurrentIndexWriterError(
                f"rebuild_index recovery at {index_path!r}: a live "
                "rebuild owns this handoff (its lease is younger than "
                f"{INDEX_LOCK_STALE_SEC:.0f}s); retry after it "
                "finishes, or after the stale window if it crashed.")
    if fs.exists(idx):
        # the raced skeleton (model-less; a committed .old or .rebuild
        # exists, so the swap owns this path). It holds at most the
        # racing writer's lock — that writer acquired on a dataset-less
        # path and its read fails loudly; the skeleton is safe to drop.
        fs.delete(idx, True)
    if staged_committed:
        # roll FORWARD: the rebuild had fully committed before the
        # crash (the sibling .rebuild survives the nesting race — a
        # nested rename consumes it, and that case lands in the
        # trash_committed branch below)
        if not fs.rename(staging, idx):
            raise LensError(
                f"rebuild_index recovery at {index_path!r}: could not "
                "roll the committed .rebuild forward — inspect the "
                "directory manually.")
        if fs.exists(trash):
            fs.delete(trash, True)
        # the crashed rebuild's planted lease travels with the
        # roll-forward; it is dead — clear it so writers need not
        # wait out the stale window
        fs.delete(P(f"{index_path}/_writer.lock"), False)
    elif fs.exists(trash):
        if not fs.rename(trash, idx):
            raise LensError(
                f"rebuild_index recovery at {index_path!r}: could not "
                "roll .old back — inspect the directory manually.")
        # the dead handoff lease traveled back with .old (r12 advice:
        # the roll-forward branch cleared it, this branch must too, or
        # every writer waits out the full stale window)
        fs.delete(P(f"{index_path}/_writer.lock"), False)


def _wait_out_skeleton_lease(spark: "SparkSession", index_path: str,
                             timeout_msg: str, *,
                             timeout_sec: float = 30.0) -> None:
    """Block until ``{index_path}/_writer.lock`` is gone or stale —
    the guard both the crash-recovery path (``_recover_rebuild``) and
    the inline nested-swap repair need before deleting a raced
    skeleton: the lock there is a LIVE concurrent writer's lease, and
    deleting it mid-critical-section re-opens the two-writer window.
    Raises ``ConcurrentIndexWriterError`` with ``timeout_msg`` if the
    lease is still fresh after ``timeout_sec`` (writers acquiring on a
    dataset-less skeleton fail loudly within milliseconds, so a fresh
    lease past the deadline means something unexpected owns the
    path)."""
    import time

    from lens_spark.operators.dedup import INDEX_LOCK_STALE_SEC

    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(index_path).getFileSystem(spark._jsc.hadoopConfiguration())
    lock = P(f"{index_path}/_writer.lock")
    deadline = time.time() + float(timeout_sec)
    while fs.exists(lock):
        # deadline first (r14 review: a getFileStatus that faults
        # persistently — permission error, flaky object store — must
        # still hit the deadline and the sleep, never busy-spin)
        if time.time() > deadline:
            raise ConcurrentIndexWriterError(timeout_msg)
        try:
            age = time.time() - fs.getFileStatus(
                lock).getModificationTime() / 1000.0
        except Exception:  # noqa: BLE001 — released mid-check, or a
            age = 0.0      # faulting stat: treat as fresh, keep waiting
        if age > INDEX_LOCK_STALE_SEC:
            return
        time.sleep(0.1)


def rebuild_index(spark: "SparkSession", index_path: str,
                  build_fn) -> dict:
    """The honest refresh for any model-bearing index (ivfpq,
    postings), as ONE call instead of a manual protocol: the builders
    REFUSE in-place rebuild because ``parts/`` and ``model.json``
    cannot be replaced atomically together (r11 — the torn window
    where codes/postings reflect one model and the file describes
    another). This helper does what their refusal text prescribes —
    ``build_fn(fresh_path)`` builds into a staging sibling
    (``<index>.rebuild``) while the OLD INDEX KEEPS SERVING, then the
    commit is two directory renames and a delete.

    ``build_fn`` receives the staging path and must leave a committed
    index there (``model.json`` present — the builders' own commit
    marker); its return value is passed through. Typical use::

        rebuild_index(spark, idx, lambda p: postings_index_build(
            corpus, p, id_col="id", text_col="text"))

    Runs under the index writer lease for its whole span, so appends
    cannot land on the old index mid-rebuild and silently vanish with
    it (the lost-update class); a heartbeat thread keeps the lease
    mtime fresh through arbitrarily long build stages (r12 verdict
    #7 — previously a single stage over the stale window could lose
    the lease mid-build). Readers never see a torn index:
    they serve the old one until the swap, and a crash at any point
    is rolled forward/back by the next ``rebuild_index`` call
    (``_recover_rebuild``'s matrix — the staging dir commits BEFORE
    the first rename, so both sides of every crash window hold a
    complete index). A crash INSIDE the rename pair leaves the
    handoff lease fresh, so recovery waits out the stale window
    before rolling forward — the price of never racing a LIVE
    rebuild's renames (recovery necessarily runs before any lock can
    be taken on the missing index path). The residual reader gap is the instant between
    the two renames, where the path briefly does not exist — a
    transient, retryable read error, the same guarantee class as the
    Hadoop commit protocol the parquet readers already ride on."""
    from lens_spark.operators.dedup import (
        _index_writer_lock,
        _lease_heartbeat,
        _refresh_writer_lock,
    )

    index_path = index_path.rstrip("/")
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(index_path).getFileSystem(spark._jsc.hadoopConfiguration())
    _recover_rebuild(spark, index_path)
    if not fs.exists(P(index_path)):
        raise LensError(
            f"rebuild_index: {index_path!r} does not exist — use the "
            "family's build call directly for a first build.")
    staging = index_path + ".rebuild"
    trash = index_path + ".old"
    # heartbeat (r12 verdict #7): build_fn is a full-corpus build —
    # a single stage longer than the stale window must not lose the
    # lease mid-rebuild to a concurrent writer's stale-break
    with _index_writer_lock(spark, index_path), \
            _lease_heartbeat(spark, index_path):
        # a crashed PREVIOUS attempt's staging (committed or not) is
        # stale — its corpus snapshot is older than the caller's
        if fs.exists(P(staging)):
            fs.delete(P(staging), True)
        result = build_fn(staging)
        if not fs.exists(P(f"{staging}/model.json")):
            raise LensError(
                f"rebuild_index: build_fn left no committed index at "
                f"{staging!r} (model.json missing) — the live index "
                "was not touched.")
        _refresh_writer_lock(spark, index_path)
        # Pre-plant our lease INSIDE the staging dir: the held lock
        # file travels into the trash with the first rename, so
        # without this the new index path would be lock-free mid-swap
        # — a writer could acquire there and then have its lock
        # deleted by our release (two-writers window). With the
        # planted file, {index_path}/_writer.lock exists continuously
        # across the swap and the release at context exit deletes
        # OUR lease, nobody else's.
        fs.createNewFile(P(f"{staging}/_writer.lock"))
        if not fs.rename(P(index_path), P(trash)):
            raise LensError(
                f"rebuild_index: could not stage {index_path!r} aside "
                "— the live index was not touched.")
        if not fs.rename(P(staging), P(index_path)):
            # roll back, and be HONEST about whether it worked (r12
            # advice: an unchecked rollback claimed "rolled back" even
            # when the old index stayed stranded in .old)
            rolled = fs.rename(P(trash), P(index_path))
            raise LensError(
                f"rebuild_index: could not rename the rebuilt index "
                f"into place at {index_path!r}; "
                + ("rolled the old index back." if rolled else
                   f"rolling the old index back ALSO failed — it is "
                   f"intact at {trash!r}; rerun rebuild_index (its "
                   "recovery restores it) or inspect manually."))
        # A concurrent writer's _index_writer_lock mkdirs the index
        # path inside the rename gap (r12 advice); Hadoop rename into
        # the existing dir then NESTS the staging dir inside it.
        # Repair inline, IN A BOUNDED LOOP (r14 review: the repair's
        # own delete→rename has the exact same gap, so a second racer
        # can nest the index AGAIN — falling through to the trash
        # delete then destroys the only complete copies): each pass
        # hoists the nested committed index back to the sibling
        # staging path, waits out the skeleton's live lease, drops the
        # skeleton, redoes the rename, and RE-VERIFIES model.json at
        # top level before anything is reclaimed. .old still exists at
        # every step, so a crash or retry-exhaustion here lands in
        # _recover_rebuild's matrix (roll back from .old, or forward
        # from the re-hoisted .rebuild).
        for attempt in range(5):
            if fs.exists(P(f"{index_path}/model.json")):
                break
            nested = P(f"{index_path}/{staging.rsplit('/', 1)[-1]}")
            if not (fs.exists(P(f"{nested.toString()}/model.json"))
                    and fs.rename(nested, P(staging))):
                raise LensError(
                    f"rebuild_index: swap at {index_path!r} did not "
                    "land model.json at top level and no nested "
                    "staging dir was found — inspect the directory "
                    f"manually (the old index is intact at {trash!r}).")
            # The skeleton may hold the racer's LIVE lease (r13
            # advice): deleting it out from under a live writer both
            # races its critical section and re-opens the two-writer
            # window (its later release would delete OUR planted
            # lease after the re-rename). Mirror _recover_rebuild:
            # wait for the skeleton lock to clear or age stale before
            # dropping the skeleton. Racers abort in milliseconds —
            # every appender verifies its index under the lock and
            # fails loudly on a dataset-less path — so the bounded
            # wait ends almost immediately; a still-fresh lock past
            # the deadline aborts this call, and _recover_rebuild
            # (committed .rebuild + .old both present) finishes the
            # swap later.
            _wait_out_skeleton_lease(
                spark, index_path,
                f"rebuild_index: a concurrent writer acquired "
                f"{index_path!r} inside the swap's rename gap and its "
                "lease is still live; rerun rebuild_index once it "
                "finishes (recovery completes this swap from the "
                f"committed {staging!r}).")
            fs.delete(P(index_path), True)
            if not fs.rename(P(staging), P(index_path)):
                rolled = fs.rename(P(trash), P(index_path))
                raise LensError(
                    f"rebuild_index: re-rename after un-nesting failed "
                    f"at {index_path!r}; "
                    + ("rolled the old index back." if rolled else
                       f"the old index is intact at {trash!r}; rerun "
                       "rebuild_index to recover."))
        if not fs.exists(P(f"{index_path}/model.json")):
            raise ConcurrentIndexWriterError(
                f"rebuild_index: the swap at {index_path!r} kept "
                "being raced by concurrent writers acquiring inside "
                "the rename gap (5 repair attempts); the old index "
                f"is intact at {trash!r} — rerun rebuild_index "
                "(recovery rolls it back or completes the swap, and "
                "the rebuild can rerun).")
        fs.delete(P(trash), True)
    return result if isinstance(result, dict) else {"rebuilt": True}


def discover_indexes(spark: "SparkSession", root: str, *,
                     max_depth: int = 4,
                     errors: "dict[str, str] | None" = None) -> list[str]:
    """Index roots under ``root``: directories holding a ``parts``
    child (or ``model.json``), found by a bounded breadth-first walk
    of the Hadoop FileSystem (hidden/underscore entries skipped, and
    the walk does not descend INTO an index — parts/pb=N subdirs are
    data, not more indexes). ``root`` itself may be an index.

    A subtree the walk cannot list (permission denied, transient FS
    fault) never aborts discovery: it is skipped, and recorded in
    ``errors`` (path → message) when the caller passes a dict —
    ``compact_all`` surfaces those alongside per-index results."""
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(root).getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(P(root)):
        raise LensError(f"discover_indexes: {root!r} does not exist")

    def is_index(d: str) -> bool:
        return (fs.exists(P(f"{d}/parts"))
                or fs.exists(P(f"{d}/parts.migrating"))
                or fs.exists(P(f"{d}/parts.old"))
                or fs.exists(P(f"{d}/model.json")))

    found: list[str] = []
    frontier = [(root, 0)]
    while frontier:
        d, depth = frontier.pop(0)
        try:
            if is_index(d):
                found.append(d)
                continue  # never descend into an index
            if depth >= max_depth:
                continue
            children = fs.listStatus(P(d))
        except Exception as e:  # noqa: BLE001 — one unreadable
            # subtree must not abort the sweep's discovery
            if errors is not None:
                errors[d] = f"{type(e).__name__}: {e}"
            continue
        for st in children:
            name = st.getPath().getName()
            if not st.isDirectory() or name.startswith(("_", ".")):
                continue
            # a rebuild_index staging (.rebuild) or trash (.old)
            # sibling looks exactly like an index — it IS one
            # mid-handoff. The sweep must neither compact it out from
            # under the rebuild that owns it nor descend into it; the
            # next rebuild_index call on the primary path recovers or
            # deletes it.
            if name.endswith((".rebuild", ".old")):
                continue
            frontier.append((f"{d.rstrip('/')}/{name}", depth + 1))
    return sorted(found)


def _health_sidecars(spark: "SparkSession", index_path: str,
                     kind: str) -> dict:
    """O(1) health observables for the dry-run sweep report — the
    nightly job doubles as the fleet's index health report (r14):
    the IVFADC drift sidecar's rebuild triggers (err_ratio,
    appended_frac, routing_l1 — see ``ivfpq_drift_report`` for the
    recipe), the postings maintained row stat, and either family's
    streaming ingest marker. Sidecar reads only — never a parquet
    listing, never index-sized work; absent/torn sidecars simply
    don't report (pre-r14 indexes, batch-only indexes)."""
    out: dict = {}
    if kind == "ivfpq":
        from lens_spark.operators.similarity import ivfpq_drift_report

        row = ivfpq_drift_report(spark, index_path).collect()[0]
        if row.n_build is not None:
            out["drift"] = {
                "appended_frac": row.appended_frac,
                "err_ratio": row.err_ratio,
                "routing_l1": row.routing_l1}
    elif kind == "postings":
        from lens_spark.operators.ranking import _read_postings_stats

        n = _read_postings_stats(spark, index_path)
        if n is not None:
            out["n_postings"] = n
    if kind in ("ivfpq", "postings"):
        from lens_spark.streaming import _read_ingest_marker

        last = _read_ingest_marker(spark, index_path)
        if last is not None:
            out["last_ingest_batch"] = last
    return out


def compact_all(spark: "SparkSession", root: str, *, max_depth: int = 4,
                dry_run: bool = False,
                drop_replay_duplicates: bool = False) -> dict:
    """The nightly job: discover every index under ``root`` and run
    each family's compactor. One index's problem never aborts the
    sweep — a live writer lease is reported as ``{"skipped":
    "locked"}`` (ingest and maintenance serialize per index, by
    design), any other failure (including non-lens ones: a corrupt
    parquet footer, a permission-denied subtree) as ``{"error": ...}``
    — so a fleet of streaming ingests and one maintenance cron coexist
    without coordination beyond the per-index lease. ``dry_run`` lists
    and classifies without rewriting — and doubles as the fleet's
    health report (r14): each retrieval index's O(1) sidecar
    observables ride along (IVFADC drift triggers, postings row stat,
    streaming ingest markers — see ``_health_sidecars``).
    ``drop_replay_duplicates`` additionally reclaims at-least-once
    replay rows in the set-semantics families (see ``compact_any``)."""
    report: dict[str, dict] = {}
    walk_errors: dict[str, str] = {}
    for idx in discover_indexes(spark, root, max_depth=max_depth,
                                errors=walk_errors):
        try:
            if dry_run:
                report[idx] = {"kind": detect_index_kind(spark, idx),
                               "dry_run": True}
                try:
                    report[idx].update(
                        _health_sidecars(spark, idx,
                                         report[idx]["kind"]))
                except Exception as e:  # noqa: BLE001 — a sidecar
                    # fault (e.g. a concurrent rebuild swap mid-read)
                    # must not fail the dry-run entry — the
                    # classification already succeeded, and
                    # "health_error" never flips the sweep exit code
                    report[idx]["health_error"] = \
                        f"{type(e).__name__}: {e}"
            else:
                report[idx] = compact_any(
                    spark, idx,
                    drop_replay_duplicates=drop_replay_duplicates)
        except ConcurrentIndexWriterError:
            report[idx] = {"skipped": "locked"}
        except EmptyIndexError:
            # a bootstrapped-but-still-empty index is benign, not a
            # problem the operator must look at (typed, never matched
            # on message text)
            report[idx] = {"skipped": "empty"}
        except LensError as e:
            report[idx] = {"error": str(e)}
        except Exception as e:  # noqa: BLE001 — the sweep must survive
            # any one index's corruption; the report carries the cause
            report[idx] = {"error": f"{type(e).__name__}: {e}"}
    for path, msg in walk_errors.items():
        report[path] = {"error": f"discovery: {msg}"}
    return report


def main(argv: "list[str] | None" = None) -> int:
    import argparse
    import json

    parser = argparse.ArgumentParser(
        prog="python -m lens_spark.maintenance",
        description="Compact every persistent lens_spark index under "
                    "a root directory (band/fingerprint/quota/ivfpq).")
    parser.add_argument("root", help="index root (local/hdfs:/s3a: path)")
    parser.add_argument("--max-depth", type=int, default=4)
    parser.add_argument("--dry-run", action="store_true",
                        help="list and classify indexes without rewriting")
    parser.add_argument("--drop-replay-duplicates", action="store_true",
                        help="also reclaim byte-identical rows left by "
                             "at-least-once replays (set-semantics "
                             "families only; quota counts are never "
                             "touched)")
    args = parser.parse_args(argv)
    from lens_spark.session import get_spark

    spark = get_spark()
    report = compact_all(spark, args.root, max_depth=args.max_depth,
                         dry_run=args.dry_run,
                         drop_replay_duplicates=args.drop_replay_duplicates)
    print(json.dumps(report, indent=2, sort_keys=True))
    return 0 if all("error" not in v for v in report.values()) else 1


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
