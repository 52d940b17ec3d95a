"""M5 stateful counter: assign a dense 1-based sequence number.

Reference: tests/modules/rust_wasm32_counter/src/lib.rs:26-52 — a lens
holding mutable module state that assigns ``Id = ++counter`` in source
order. Spark has no stable "source order" after a shuffle, so our
counter requires an explicit ordering (documented divergence, SURVEY.md
§7.4a); determinism then comes from the sort, not arrival order.

Two strategies:

- ``window``: ``row_number() OVER (ORDER BY ...)`` — one global-order
  window. Correct, but Spark plans a single-partition sort for a global
  window: fine for dims, a bottleneck at 100 TB.
- ``distributed`` (default): two-pass range-partitioned numbering. Rows
  are range-partitioned and sorted by the key; pass 1 counts rows per
  partition (tiny aggregate), pass 2 adds the partition's cumulative
  offset to a *per-partition* row_number. Every partition numbers its
  own rows in parallel — the same technique as RDD zipWithIndex, kept
  in DataFrame land. The partitioned frame is persisted between the
  two passes so both observe identical range boundaries.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lens_spark.errors import LensError
from lens_spark.operators.base import Lens, check_reserved, register_lens, require_arg

_PID = "__lens_pid"


def assign_sequence(df: DataFrame, order_by: list[str], out: str = "id",
                    start: int = 1, strategy: str = "distributed",
                    materialize: bool = True) -> DataFrame:
    """``materialize=True`` (default) localCheckpoints the numbered
    result and releases the intermediate cache before returning — no
    dataset-sized persist stays pinned for the session (the checkpoint
    blocks themselves are reclaimed by the ContextCleaner when the
    returned DataFrame is garbage-collected). ``materialize=False``
    returns the lazy plan over the persisted intermediate for callers
    that immediately write the result and manage the cache themselves
    (the persist uses MEMORY_AND_DISK, so it spills instead of
    evicting — eviction would trigger a range-repartition recompute).
    """
    check_reserved(df, {"__lens_mid"}, "assign_sequence")
    for c in order_by:
        if c not in df.columns:
            raise LensError(f"lens 'counter': property with name '{c}' not found")
    order_cols = [F.col(c) for c in order_by]

    if strategy == "window":
        w = Window.orderBy(*order_cols)
        seq = F.row_number().over(w) + F.lit(start - 1)
        return df.withColumn(out, seq.cast("bigint"))

    if strategy != "distributed":
        raise LensError(f"lens 'counter': unknown strategy '{strategy}'")

    num_parts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    # One full-data shuffle total: range-partition + in-partition sort,
    # then a narrow monotonically_increasing_id — its per-partition
    # value is a dense 0-based row index in sorted order, so
    # (mid - min(mid per partition)) is the local rank with NO window
    # (a row_number window partitioned by pid would re-Exchange the
    # whole dataset on pid — a second full shuffle for nothing).
    parts = (
        df.repartitionByRange(num_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn("__lens_mid", F.monotonically_increasing_id())
        # pin partition layout + ids across the two passes; spill to
        # disk rather than evict (eviction would recompute the range
        # repartition with fresh sampled boundaries)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        stats = {r[_PID]: (r["cnt"], r["mmin"]) for r in
                 parts.groupBy(_PID).agg(
                     F.count(F.lit(1)).alias("cnt"),
                     F.min("__lens_mid").alias("mmin")).collect()}
        base, acc = {}, start - 1
        for pid in sorted(stats):
            cnt, mmin = stats[pid]
            # seq = acc + 1 + (mid - mmin)  ⇒  add (acc + 1 - mmin)
            base[pid] = acc + 1 - mmin
            acc += cnt
        base_expr = F.element_at(
            F.create_map(*[F.lit(x) for pid in sorted(base)
                           for x in (pid, base[pid])]),
            F.col(_PID),
        )
        out_df = (
            parts.withColumn(out, (F.col("__lens_mid") + base_expr).cast("bigint"))
            .drop(_PID, "__lens_mid")
        )
        if materialize:
            # Truncate lineage into checkpoint blocks, then release the
            # intermediate cache — success path no longer leaves a
            # dataset-sized persist pinned for the session.
            out_df = out_df.localCheckpoint(eager=True)
            parts.unpersist()
        return out_df
    except Exception:
        parts.unpersist()
        raise


@register_lens("counter")
def counter_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: order_by (list[str], required), out ("id"), start (1),
    strategy ("distributed" | "window")."""
    order_by = [str(c) for c in require_arg(arguments, "order_by", "counter")]
    out = str(arguments.get("out", "id"))
    start = int(arguments.get("start", 1))
    strategy = str(arguments.get("strategy", "distributed"))

    def forward(df: DataFrame) -> DataFrame:
        return assign_sequence(df, order_by, out, start, strategy)

    def inverse(df: DataFrame) -> DataFrame:
        # Removing the assigned id restores the input schema exactly.
        return df.drop(out)

    return Lens("counter", arguments, forward, inverse)
