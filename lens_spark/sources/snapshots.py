"""Manifest-based versioned datasets: snapshot writes, time travel,
vacuum — the corpus-versioning layer a training-data pipeline needs
around its curated exports (pair with ``dataset_diff`` to audit what
changed between two versions).

Design (a deliberately small subset of the open table-format recipe —
manifest lists immutable data directories; commits are atomic manifest
creates):

- ``<path>/data/<token>/`` — immutable parquet directories, one per
  write (never rewritten, never appended into);
- ``<path>/_manifests/v{N:08d}.json`` — version N's file list (relative
  dir names) + parent pointer. The LATEST version is the max N.
- A commit stages its data directory first, then creates its manifest
  with ``overwrite=False`` — an atomic create on HDFS-like filesystems,
  so two concurrent writers cannot both own version N: the loser's
  create fails and it retries against the new latest (optimistic
  concurrency, same contract as the registry's transactions). A crash
  between data-stage and manifest-create leaves an orphan data dir that
  is invisible to every reader and reclaimed by ``snapshot_vacuum``.

Scale: manifests hold directory names (not per-file lists), so a
manifest is O(commits) bytes, KB-scale; readers pass the listed
directories straight to the parquet scan, preserving predicate pushdown
and partition pruning within each directory. All filesystem access goes
through the Hadoop FS API (the compact_dataset contract) so the same
code runs on ``hdfs:``/``s3a:`` paths.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs


def _manifest_path(jvm, root: str, version: int):
    return jvm.org.apache.hadoop.fs.Path(
        f"{root.rstrip('/')}/{_MANIFEST_DIR}/v{version:08d}.json")


def _list_versions(spark: SparkSession, path: str) -> list[int]:
    jvm, fs = _fs(spark, path)
    mdir = jvm.org.apache.hadoop.fs.Path(
        f"{path.rstrip('/')}/{_MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                pass
    return sorted(out)


def _read_manifest(spark: SparkSession, path: str, version: int) -> dict:
    from lens_spark.sources import read_json_file

    jvm, fs = _fs(spark, path)
    mp = _manifest_path(jvm, path, version)
    meta = read_json_file(spark, mp.toString())
    if meta is None:
        raise FileNotFoundError(
            f"snapshot manifest v{version} missing under {path!r}")
    return meta


def snapshot_write(df: DataFrame, path: str, *, mode: str = "append",
                   max_retries: int = 10) -> int:
    """Commit ``df`` as a new dataset version; returns the version id.

    ``mode="append"``: the new version = parent's directories + this
    write's. ``mode="overwrite"``: the new version lists ONLY this
    write's directory — prior versions stay readable (time travel)
    until ``snapshot_vacuum`` reclaims them.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"snapshot_write: unknown mode '{mode}'")
    spark = df.sparkSession
    token = uuid.uuid4().hex[:12]
    rel_dir = f"data/{token}"
    df.write.mode("error").parquet(f"{path.rstrip('/')}/{rel_dir}")
    jvm, fs = _fs(spark, path)
    for _ in range(max_retries):
        versions = _list_versions(spark, path)
        parent = versions[-1] if versions else None
        dirs = [rel_dir]
        if mode == "append" and parent is not None:
            dirs = _read_manifest(spark, path, parent)["dirs"] + dirs
        version = (parent or 0) + 1
        manifest = {"version": version, "parent": parent, "mode": mode,
                    "dirs": dirs}
        mp = _manifest_path(jvm, path, version)
        fs.mkdirs(mp.getParent())
        try:
            # atomic create (overwrite=False): the optimistic lock —
            # exactly one writer owns version N
            stream = fs.create(mp, False)
        except Exception:
            continue  # lost the race — retry against the new latest
        try:
            stream.write(json.dumps(manifest, sort_keys=True)
                         .encode("utf-8"))
        finally:
            stream.close()
        return version
    raise IOError(
        f"snapshot_write: lost the commit race {max_retries} times at "
        f"{path} — contention this high needs an external queue")


def snapshot_read(spark: SparkSession, path: str, *,
                  version: int | None = None) -> DataFrame:
    """Read a dataset version (default: latest). Time travel = pass an
    older version id."""
    versions = _list_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"snapshot_read: no versions at {path}")
    v = versions[-1] if version is None else int(version)
    if v not in versions:
        raise FileNotFoundError(
            f"snapshot_read: version {v} not in {versions} at {path}")
    dirs = _read_manifest(spark, path, v)["dirs"]
    return spark.read.parquet(
        *[f"{path.rstrip('/')}/{d}" for d in dirs])


def snapshot_versions(spark: SparkSession, path: str) -> list[dict]:
    """All manifests, oldest→newest (version, parent, mode, n_dirs)."""
    out = []
    for v in _list_versions(spark, path):
        m = _read_manifest(spark, path, v)
        out.append({"version": v, "parent": m.get("parent"),
                    "mode": m.get("mode"), "n_dirs": len(m["dirs"])})
    return out


def snapshot_vacuum(spark: SparkSession, path: str, *,
                    keep_last: int = 2) -> int:
    """Reclaim storage: drop all but the newest ``keep_last`` manifests,
    then delete every data directory no kept manifest references
    (including orphans from crashed commits). Returns directories
    deleted. Deletion order is manifests-first so a crash mid-vacuum
    can never leave a kept manifest pointing at deleted data.
    """
    if keep_last < 1:
        raise ValueError("snapshot_vacuum: keep_last must be >= 1")
    jvm, fs = _fs(spark, path)
    versions = _list_versions(spark, path)
    keep = set(versions[-keep_last:])
    referenced: set[str] = set()
    for v in sorted(keep):
        referenced.update(_read_manifest(spark, path, v)["dirs"])
    for v in versions:
        if v not in keep:
            fs.delete(_manifest_path(jvm, path, v), False)
    data_dir = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/data")
    removed = 0
    if fs.exists(data_dir):
        for st in fs.listStatus(data_dir):
            rel = f"data/{st.getPath().getName()}"
            if rel not in referenced:
                fs.delete(st.getPath(), True)
                removed += 1
    return removed


def snapshot_diff(spark: SparkSession, path: str, v_old: int, v_new: int,
                  key_cols: "list[str]") -> DataFrame:
    """Row-level diff between two dataset versions, keyed by
    ``key_cols``: one row per key present in either version with a
    ``change`` column ∈ {'added', 'removed', 'changed', 'unchanged'}.
    The CDC-style audit a curation pipeline runs after every ingest
    ("what did this batch actually do?") — the read-side complement of
    snapshot_write's time travel. Non-key columns are compared via an
    xxhash64 over their sorted-name struct, so the join exchanges carry
    keys + one long, never the payload.

    Scale shape: two manifest-pruned parquet scans → ONE shuffle each
    on the key columns for the full outer join (sort-merge at scale,
    AQE-broadcast when a side is small). No driver materialization.
    """
    keys = [str(k) for k in key_cols]
    if not keys:
        raise ValueError("snapshot_diff: key_cols must be non-empty")
    import pyspark.sql.functions as F

    old = snapshot_read(spark, path, version=v_old)
    new = snapshot_read(spark, path, version=v_new)
    payload = sorted(c for c in old.columns if c not in keys)
    if payload != sorted(c for c in new.columns if c not in keys):
        raise ValueError(
            "snapshot_diff: versions disagree on non-key columns "
            f"({payload} vs {sorted(set(new.columns) - set(keys))})")
    h = F.xxhash64(*[F.col(c) for c in payload]) if payload else F.lit(0)
    a = old.select(*keys, h.alias("__h_old"), F.lit(1).alias("__in_old"))
    b = new.select(*keys, h.alias("__h_new"), F.lit(1).alias("__in_new"))
    j = a.join(b, keys, "full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged")))
    return j.select(*keys, change.alias("change"))
