"""X5 text-analysis operators as registered lenses over a text column.

All computation is Catalyst-side (lens_spark.functions.text); these
wrappers just bind column names from pipeline arguments.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    predict_lang,
    punct_ratio,
    quality_score,
    stopword_ratio,
    whitespace_token_count,
)
from lens_spark.operators.base import Lens, ensure_parallelism, register_lens, require_arg


def text_stats(df: DataFrame, text_col: str, prefix: str = "") -> DataFrame:
    """Append the full text-metrics block in one narrow projection."""
    t = F.col(text_col)
    df = ensure_parallelism(df)  # regex-heavy per row; fan out small scans
    return (
        df.withColumn(f"{prefix}n_tokens", whitespace_token_count(t))
        .withColumn(f"{prefix}n_bpe_tokens", bpe_ish_token_count(t))
        .withColumn(f"{prefix}punct_ratio", F.round(punct_ratio(t), 6))
        .withColumn(f"{prefix}stopword_ratio", F.round(stopword_ratio(t), 6))
        .withColumn(f"{prefix}quality", quality_score(t))
        .withColumn(f"{prefix}pred_lang", predict_lang(t))
        .withColumn(f"{prefix}fingerprint", fingerprint(t))
    )


@register_lens("text_stats")
def text_stats_lens(arguments: Mapping[str, Any]) -> Lens:
    text_col = str(require_arg(arguments, "column", "text_stats"))
    prefix = str(arguments.get("prefix", ""))
    return Lens("text_stats", arguments, lambda df: text_stats(df, text_col, prefix))


@register_lens("lang_id")
def lang_id_lens(arguments: Mapping[str, Any]) -> Lens:
    text_col = str(require_arg(arguments, "column", "lang_id"))
    out = str(arguments.get("out", "pred_lang"))
    return Lens("lang_id", arguments,
                lambda df: df.withColumn(out, predict_lang(F.col(text_col))))


@register_lens("quality_score")
def quality_score_lens(arguments: Mapping[str, Any]) -> Lens:
    text_col = str(require_arg(arguments, "column", "quality_score"))
    out = str(arguments.get("out", "quality"))
    return Lens("quality_score", arguments,
                lambda df: df.withColumn(out, quality_score(F.col(text_col))))


@register_lens("fingerprint")
def fingerprint_lens(arguments: Mapping[str, Any]) -> Lens:
    text_col = str(require_arg(arguments, "column", "fingerprint"))
    out = str(arguments.get("out", "fingerprint"))
    return Lens("fingerprint", arguments,
                lambda df: df.withColumn(out, fingerprint(F.col(text_col))))
