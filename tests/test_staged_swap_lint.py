"""Static lint: every persistent index publishes rewrites through the
ONE shared staged-rename protocol (``dedup._staged_swap``).

Four index families (MinHash band, exact-fingerprint, quota count,
IVFPQ code) each need the same crash-safe swap — write the replacement
to ``parts.migrating``, rename ``parts`` aside, rename the tmp into
place, delete the old copy — and the r10/r11 advice findings were
drift between private copies of exactly this sequence (the quota sink
missing the recovery probe the dedup peers had). The sequence now
lives once in ``dedup._staged_swap`` with ``_parts_pb_migration_
recover`` / ``_parts_migration_leftovers`` as its recovery/refusal
halves; this lint fails if a new private copy appears. Pure source
analysis — no SparkSession."""

from __future__ import annotations

import ast
import glob
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The only functions allowed to call fs.rename on a ``.migrating`` /
# ``.old`` staging path. Everything else must route through
# _staged_swap (or has a genuinely different protocol, reviewed here):
#   _staged_swap              — the shared swap itself
#   _parts_pb_migration_recover — its roll-forward half
#   _migrate_flat_fp_index    — legacy flat→parts bootstrap: no parts/
#                               to stage aside, single rename with a
#                               _SUCCESS completeness witness
#   compact_dataset           — generic dataset compactor with its own
#                               __compacting/__old + rollback protocol
#   rebuild_index /           — the WHOLE-INDEX-dir handoff (r12):
#   _recover_rebuild            parts/ and model.json must move
#                               together atomically, which the
#                               parts-level _staged_swap cannot
#                               express; staging commits (model.json
#                               marker) BEFORE the first rename, with
#                               its own forward/back recovery matrix
#                               (maintenance._recover_rebuild) and a
#                               crash pytest per window
#   _compact_partition_subset — the PER-PARTITION variant of
#   / _partition_swap_recover   _staged_swap (r13, subset compaction):
#                               same write-tmp → rename-aside →
#                               rename-in → delete sequence applied to
#                               ONE partition dir through HIDDEN
#                               (dot-prefixed) siblings, with its own
#                               recovery half and reader refusal via
#                               _parts_migration_leftovers; lives in
#                               dedup.py beside _staged_swap — the one
#                               shared copy every family calls
ALLOWED_RENAMERS = {
    "_staged_swap",
    "_parts_pb_migration_recover",
    "_migrate_flat_fp_index",
    "compact_dataset",
    "rebuild_index",
    "_recover_rebuild",
    "_compact_partition_subset",
    "_partition_swap_recover",
}

STAGING_MARKERS = (".migrating", ".old", "__compacting", "__old")


def _is_fs_rename(call: ast.Call) -> bool:
    return (isinstance(call.func, ast.Attribute)
            and call.func.attr == "rename")


def _touches_staging(fn: ast.FunctionDef) -> bool:
    """Does the function body mention a staging-path suffix literal?"""
    for node in ast.walk(fn):
        if (isinstance(node, ast.Constant) and isinstance(node.value, str)
                and any(m in node.value for m in STAGING_MARKERS)):
            return True
    return False


def test_staging_renames_only_in_shared_protocol():
    offenders = []
    for path in glob.glob(os.path.join(REPO, "lens_spark", "**", "*.py"),
                          recursive=True):
        tree = ast.parse(open(path).read(), filename=path)
        for fn in [n for n in ast.walk(tree)
                   if isinstance(n, (ast.FunctionDef,
                                     ast.AsyncFunctionDef))]:
            renames = [n for n in ast.walk(fn)
                       if isinstance(n, ast.Call) and _is_fs_rename(n)]
            if not renames or not _touches_staging(fn):
                continue
            # nested helpers (write_tmp closures) carry no renames, so
            # attribute the hit to the innermost named function
            if fn.name not in ALLOWED_RENAMERS:
                offenders.append(
                    f"{os.path.relpath(path, REPO)}:{fn.lineno} "
                    f"{fn.name} renames a staging path outside the "
                    "shared _staged_swap protocol")
    # the lock-breaking rename in _index_writer_lock targets
    # _writer.lock.stale-*, not a staging dataset — it has no staging
    # marker literal, so it never reaches the check above
    assert not offenders, "\n".join(offenders)


def test_staged_swap_used_by_every_index_compactor():
    """The four index maintainers must actually call the shared swap
    (a compactor quietly rewriting in place would dodge the lint
    above while losing crash-safety)."""
    required = {
        "lens_spark/operators/dedup.py":
            {"compact_index", "_migrate_parts_to_bucketed"},
        "lens_spark/streaming/__init__.py": {"_compact_quota_parts"},
        "lens_spark/operators/similarity.py": {"compact_ivfpq_index"},
    }
    for rel, fns in required.items():
        tree = ast.parse(open(os.path.join(REPO, rel)).read())
        by_name = {n.name: n for n in ast.walk(tree)
                   if isinstance(n, ast.FunctionDef)}
        for fname in fns:
            assert fname in by_name, f"{rel}: {fname} missing"
            calls = {n.func.id if isinstance(n.func, ast.Name)
                     else getattr(n.func, "attr", None)
                     for n in ast.walk(by_name[fname])
                     if isinstance(n, ast.Call)}
            assert "_staged_swap" in calls, (
                f"{rel}: {fname} does not publish through the shared "
                "_staged_swap protocol")
