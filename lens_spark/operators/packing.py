"""X8 training-sequence packing: assign documents to fixed token-budget
training sequences (a.k.a. example packing / sample packing).

LLM pre-training consumes fixed-length sequences; feeding one short
document per sequence wastes most of the context window. Packing
greedily fills each sequence up to ``max_tokens`` with whole documents.
A globally optimal bin packing is NP-hard and inherently sequential —
the distributed contract here is:

- documents are sharded deterministically by content hash (so the
  layout is reproducible run-to-run and repartition-stable, the same
  property as operators.sampling);
- within a shard, documents are packed in ascending id order with a
  greedy first-fit-to-current-bin pass (``applyInPandas`` per shard —
  each task sees one shard's (id, n_tokens) pairs only, never the
  text, so shard state is a few MB even for billions of docs);
- sequence ids are globally unique: (shard << 32) | local_seq.

Waste is bounded: a document longer than ``max_tokens`` gets its own
(oversized, ``truncate``-flagged) sequence; average fill at typical
document/budget ratios is within a few % of the FFD bound.
"""

from __future__ import annotations

from typing import Any, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_spark.functions.text import whitespace_token_count
from lens_spark.operators.base import Lens, check_reserved, register_lens, require_arg


def pack_sequences(df: DataFrame, id_col: str, *,
                   max_tokens: int, token_count_col: str | None = None,
                   text_col: str | None = None,
                   num_shards: int = 64) -> DataFrame:
    """Assign each document a (seq_id, seq_pos, seq_tokens) packing.

    Token counts come from ``token_count_col`` if given, else are
    counted (whitespace) from ``text_col``. Output columns:
    ``seq_id`` (globally unique bigint), ``seq_pos`` (position of the
    doc inside its sequence), ``n_tokens``, ``truncate`` (true when a
    single doc exceeds ``max_tokens`` and would need truncation).
    """
    check_reserved(df, {"__nt", "__shard"}, "pack_sequences")
    from lens_spark.errors import LensError

    if token_count_col is None and text_col is None:
        raise LensError("pack_sequences needs token_count_col or text_col")
    if token_count_col is not None:
        counted = df.withColumn("__nt", F.col(token_count_col).cast("bigint"))
    else:
        counted = df.withColumn("__nt",
                                whitespace_token_count(F.col(text_col)))
    budget = int(max_tokens)
    slim = counted.select(
        F.col(id_col),
        F.col("__nt"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")),
               F.lit(num_shards)).alias("__shard"),
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        shard = int(pdf["__shard"].iloc[0])
        seq_local, pos, used = 0, 0, 0
        seq_ids, seq_pos, trunc = [], [], []
        for nt in pdf["__nt"]:
            nt = int(nt)
            if pos > 0 and used + nt > budget:
                seq_local += 1
                pos, used = 0, 0
            seq_ids.append((shard << 32) | seq_local)
            seq_pos.append(pos)
            trunc.append(nt > budget)
            used += nt
            pos += 1
            if used >= budget:
                seq_local += 1
                pos, used = 0, 0
        out = pdf[[id_col, "__nt"]].copy()
        out.columns = [id_col, "n_tokens"]
        out["seq_id"] = pd.Series(seq_ids, dtype="int64")
        out["seq_pos"] = pd.Series(seq_pos, dtype="int64")
        out["truncate"] = pd.Series(trunc, dtype="bool")
        return out

    id_type = dict(slim.dtypes)[id_col]
    schema = (f"{id_col} {id_type}, n_tokens bigint, seq_id bigint, "
              f"seq_pos bigint, truncate boolean")
    return slim.groupBy("__shard").applyInPandas(pack_shard, schema)


@register_lens("pack_sequences")
def pack_sequences_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, max_tokens, and one of token_count_column /
    column (text); num_shards (64)."""
    id_col = str(require_arg(arguments, "id", "pack_sequences"))
    max_tokens = int(require_arg(arguments, "max_tokens", "pack_sequences"))
    tc = arguments.get("token_count_column")
    text = arguments.get("column")
    return Lens(
        "pack_sequences", arguments,
        lambda df: pack_sequences(
            df, id_col, max_tokens=max_tokens,
            token_count_col=str(tc) if tc else None,
            text_col=str(text) if text else None,
            num_shards=int(arguments.get("num_shards", 64))))


def concat_blocks(df: DataFrame, id_col: str, *, block_tokens: int,
                  token_count_col: str | None = None,
                  text_col: str | None = None,
                  num_shards: int = 64, sep_tokens: int = 0,
                  salt: str = "") -> DataFrame:
    """GPT-style concatenate-and-split: lay the corpus out as one
    deterministic token stream per shard and record, for every doc,
    its offset and the fixed-size training blocks it lands in.

    The dual of :func:`pack_sequences`: there, whole docs pack into
    sequences (no doc spans two); here, the stream splits at exact
    ``block_tokens`` boundaries and docs MAY span blocks —
    ``block_first``/``block_last`` are the (global) ids of the first
    and last block touched, ``start_tok`` the within-shard offset.
    ``sep_tokens`` reserves stream positions after each doc (an EOD
    token). Stream order is the ``shuffle_shards`` contract — md5
    shard + (hash, id) order — so the layout is reproducible and
    repartition-stable; blocks never cross shards, making each shard
    an independently consumable training file.

    Returns the slim frame ``(id, shard, start_tok, n_tokens,
    block_first, block_last)`` — join back on id for payloads, so the
    shard window sorts (hash, id, count) tuples, never text. One
    exchange; per-shard cumulative sums via one ROWS window.
    ``num_shards`` is the task-size dial (same contract as
    pack_sequences). Empty docs get block_last = block_first.
    """
    check_reserved(df, {"__end", "__h", "__nt"}, "concat_blocks")
    from pyspark.sql import Window

    from lens_spark.errors import LensError
    from lens_spark.operators.sampling import _hash_prefix

    if block_tokens < 1:
        raise LensError("concat_blocks: block_tokens must be >= 1")
    if token_count_col is None and text_col is None:
        raise LensError("concat_blocks needs token_count_col or text_col")
    if token_count_col is not None:
        counted = df.withColumn("__nt", F.col(token_count_col).cast("bigint"))
    else:
        counted = df.withColumn("__nt",
                                whitespace_token_count(F.col(text_col)))
    b = int(block_tokens)
    sep = int(sep_tokens)
    hp = _hash_prefix([id_col], salt)
    slim = counted.select(
        F.col(id_col), F.col("__nt"), hp.alias("__h"),
        (F.conv(hp, 16, 10).cast("bigint") % F.lit(int(num_shards)))
        .alias("shard"))
    w = (Window.partitionBy("shard").orderBy("__h", id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum(F.col("__nt") + sep).over(w), F.lit(0))
    out = (slim.withColumn("start_tok", start)
           .withColumn("__end", F.col("start_tok")
                       + F.greatest(F.col("__nt") - 1, F.lit(0))))
    blk = lambda c: (F.col("shard") * F.lit(1 << 32)  # noqa: E731
                     + F.floor(c / b)).cast("bigint")
    return out.select(
        F.col(id_col), F.col("shard").cast("bigint").alias("shard"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.col("__nt").alias("n_tokens"),
        blk(F.col("start_tok")).alias("block_first"),
        blk(F.col("__end")).alias("block_last"))


@register_lens("concat_blocks")
def concat_blocks_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, block_tokens, and one of token_count_column /
    column (text); num_shards (64), sep_tokens (0), salt ("")."""
    id_col = str(require_arg(arguments, "id", "concat_blocks"))
    bt = int(require_arg(arguments, "block_tokens", "concat_blocks"))
    tc = arguments.get("token_count_column")
    text = arguments.get("column")
    return Lens(
        "concat_blocks", arguments,
        lambda df: concat_blocks(
            df, id_col, block_tokens=bt,
            token_count_col=str(tc) if tc else None,
            text_col=str(text) if text else None,
            num_shards=int(arguments.get("num_shards", 64)),
            sep_tokens=int(arguments.get("sep_tokens", 0)),
            salt=str(arguments.get("salt", ""))))


def length_batches(df: DataFrame, id_col: str, *, batch_size: int,
                   token_count_col: str | None = None,
                   text_col: str | None = None,
                   num_shards: int = 64, salt: str = "") -> DataFrame:
    """Length-grouped batching: documents are grouped into fixed-size
    training batches of SIMILAR token length, so per-batch padding
    waste (pad-to-longest) stays small — the dynamic-batching /
    bucketed-batching step of a fine-tuning export.

    Contract: md5-shard (reproducible, repartition-stable — the
    shuffle_shards idiom), order within a shard by (token count, id),
    slice into consecutive runs of ``batch_size``. Returns the slim
    frame ``(id, n_tokens, batch_id, batch_pos)`` — globally unique
    ``batch_id = (shard << 32) | local``; the tail batch of each
    shard may be short. Join payloads back on id: the per-shard sort
    carries (hash, count, id) tuples, never text. ``num_shards``
    bounds the sort (the pack_sequences contract) and only weakens
    the grouping marginally: shards are content-hash uniform, so
    every shard sees the full length distribution.
    """
    check_reserved(df, {"__nt", "__shard"}, "length_batches")
    from pyspark.sql import Window

    from lens_spark.errors import LensError
    from lens_spark.operators.sampling import _hash_prefix

    if batch_size < 1:
        raise LensError("length_batches: batch_size must be >= 1")
    if token_count_col is None and text_col is None:
        raise LensError("length_batches needs token_count_col or text_col")
    if token_count_col is not None:
        counted = df.withColumn("__nt", F.col(token_count_col).cast("bigint"))
    else:
        counted = df.withColumn("__nt",
                                whitespace_token_count(F.col(text_col)))
    hp = _hash_prefix([id_col], salt)
    slim = counted.select(
        F.col(id_col), F.col("__nt"),
        (F.conv(hp, 16, 10).cast("bigint") % F.lit(int(num_shards)))
        .alias("__shard"))
    w = Window.partitionBy("__shard").orderBy(F.col("__nt").asc(),
                                              F.col(id_col).asc())
    idx = F.row_number().over(w) - 1
    return slim.select(
        F.col(id_col), F.col("__nt").alias("n_tokens"),
        (F.col("__shard") * F.lit(1 << 32)
         + F.floor(idx / int(batch_size))).cast("bigint").alias("batch_id"),
        (idx % int(batch_size)).cast("bigint").alias("batch_pos"))


@register_lens("length_batches")
def length_batches_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, batch_size, and one of token_count_column /
    column (text); num_shards (64), salt ("")."""
    id_col = str(require_arg(arguments, "id", "length_batches"))
    bs = int(require_arg(arguments, "batch_size", "length_batches"))
    tc = arguments.get("token_count_column")
    text = arguments.get("column")
    return Lens(
        "length_batches", arguments,
        lambda df: length_batches(
            df, id_col, batch_size=bs,
            token_count_col=str(tc) if tc else None,
            text_col=str(text) if text else None,
            num_shards=int(arguments.get("num_shards", 64)),
            salt=str(arguments.get("salt", ""))))
