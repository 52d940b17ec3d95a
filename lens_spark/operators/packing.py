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
from lens_spark.operators.base import Lens, register_lens, require_arg


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
