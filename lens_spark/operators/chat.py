"""Conversation / SFT-formatting operators.

The reference pipes documents through per-item transforms
(``/root/reference`` host engines apply lenses doc-by-doc); an LLM
fine-tuning pipeline additionally needs the conversation→training-text
step: render a structured message list with a chat template and locate
the spans the loss applies to (assistant turns only). Both are pure
string/integer arithmetic per row, so they run entirely JVM-side as
higher-order array expressions — no exchange, no Python, and the
template fold is mirrored term-for-term by a SQL oracle.

100 TB shape: zero shuffles — a narrow projection over whatever
partitioning the scan produced; rendered text and span offsets are
computed in one ``aggregate`` fold per row (never re-concatenated per
message pair, which would be O(messages²) string copying).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_spark.errors import LensError
from lens_spark.operators.base import Lens, register_lens, require_arg

# The ChatML-style template rendered per message:
#   <|im_start|>{role}\n{content}<|im_end|>\n
# Kept as named constants so the Spark fold, the oracle SQL builder,
# and the tests agree on the byte layout (and its arithmetic: the
# content of message m starts at cum_len_before + len(OPEN) +
# len(role) + 1).
TMPL_OPEN = "<|im_start|>"
TMPL_CLOSE = "<|im_end|>\n"
_OPEN_LEN = len(TMPL_OPEN)          # 12
_CLOSE_LEN = len(TMPL_CLOSE)        # 11


def _segment(m) -> "F.Column":
    return F.concat(F.lit(TMPL_OPEN), m["role"], F.lit("\n"),
                    m["content"], F.lit(TMPL_CLOSE))


def chat_render(df: DataFrame, messages_col: str, *,
                loss_role: str = "assistant",
                out: str = "rendered") -> DataFrame:
    """Render ``messages_col`` (``array<struct<role,content>>``) into
    training text and locate the loss spans.

    Appends:
      - ``out``: the rendered conversation (ChatML-style template);
      - ``n_turns``: message count;
      - ``loss_spans``: ``array<struct<s,e>>`` — 0-based [s, e) char
        offsets of each ``loss_role`` message's content inside the
        rendered string (what an SFT data loader masks everything
        outside of);
      - ``n_loss_tokens``: whitespace-token count summed over
        ``loss_role`` contents — the "billable" token number a
        mixture planner budgets with.

    Spans come from ONE ``aggregate`` fold carrying (cursor, spans):
    per message the cursor advances by the template segment length and
    a loss-role message appends (cursor + prefix, …) — O(messages) and
    exact, vs. re-rendering prefixes per message (O(n²) strings) or
    ``instr`` searches (wrong on repeated content).
    """
    msgs = F.col(messages_col)
    rendered = F.concat_ws("", F.transform(msgs, _segment))

    # seg_len(m) = OPEN + role + '\n' + content + CLOSE
    def _seg_len(m):
        return (F.lit(_OPEN_LEN + 1 + _CLOSE_LEN)
                + F.length(m["role"]) + F.length(m["content"]))

    zero = F.struct(
        F.lit(0).cast("bigint").alias("pos"),
        F.expr("CAST(array() AS array<struct<s: bigint, e: bigint>>)")
        .alias("spans"))

    def _step(acc, m):
        start = acc["pos"] + F.lit(_OPEN_LEN + 1) + F.length(m["role"])
        span = F.struct(start.alias("s"),
                        (start + F.length(m["content"])).alias("e"))
        return F.struct(
            (acc["pos"] + _seg_len(m)).alias("pos"),
            F.when(m["role"] == F.lit(loss_role),
                   F.array_append(acc["spans"], span))
            .otherwise(acc["spans"]).alias("spans"))

    spans = F.aggregate(msgs, zero, _step, lambda acc: acc["spans"])

    n_loss = F.aggregate(
        F.filter(msgs, lambda m: m["role"] == F.lit(loss_role)),
        F.lit(0).cast("bigint"),
        lambda acc, m: acc + F.size(
            F.filter(F.split(m["content"], r"\s+"), lambda x: x != ""))
        .cast("bigint"))

    return (df.withColumn(out, rendered)
            .withColumn("n_turns", F.size(msgs).cast("int"))
            .withColumn("loss_spans", spans)
            .withColumn("n_loss_tokens", n_loss))


def preference_pairs(df: DataFrame, prompt_col: str, id_col: str,
                     score_col: str, *, min_margin: float = 0.0,
                     min_candidates: int = 2) -> DataFrame:
    """Build DPO/RLHF preference pairs: for every prompt group, pick
    the highest-scored response as ``chosen`` and the lowest as
    ``rejected`` (best-vs-worst pairing — the highest-signal pair a
    reward dataset can extract from k samples), keeping groups with at
    least ``min_candidates`` responses and a score margin of at least
    ``min_margin``.

    Tie-breaking is deterministic and documented: among equal-score
    responses, ``chosen`` takes the LARGEST id and ``rejected`` the
    SMALLEST (lexicographic struct min/max over (score, id)), so the
    output is stable across runs, partitionings, and engines.

    100 TB shape: ONE partial-aggregated groupBy — the exchange
    carries per-prompt (two (score,id) structs + a count), never
    response text; struct min/max combine map-side exactly like
    min/max. Join text payloads back on chosen_id/rejected_id
    afterwards. The margin subtraction is a single IEEE op on
    identical inputs — hash-safe per the digest contract.
    """
    g = (df.groupBy(F.col(prompt_col).alias("prompt"))
         .agg(F.max(F.struct(F.col(score_col).alias("s"),
                             F.col(id_col).alias("i"))).alias("ch"),
              F.min(F.struct(F.col(score_col).alias("s"),
                             F.col(id_col).alias("i"))).alias("rj"),
              F.count(F.lit(1)).alias("n_candidates")))
    return (g.filter((F.col("n_candidates") >= int(min_candidates))
                     & (F.col("ch.i") != F.col("rj.i"))
                     & (F.col("ch.s") - F.col("rj.s") >= F.lit(min_margin)))
            .select("prompt",
                    F.col("ch.i").alias("chosen_id"),
                    F.col("rj.i").alias("rejected_id"),
                    F.col("ch.s").alias("chosen_score"),
                    F.col("rj.s").alias("rejected_score"),
                    (F.col("ch.s") - F.col("rj.s")).alias("margin"),
                    "n_candidates"))


@register_lens("preference_pairs")
def preference_pairs_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: prompt (group col), id, score, min_margin (0),
    min_candidates (2)."""
    prompt = str(require_arg(arguments, "prompt", "preference_pairs"))
    id_col = str(require_arg(arguments, "id", "preference_pairs"))
    score = str(require_arg(arguments, "score", "preference_pairs"))
    return Lens(
        "preference_pairs", arguments,
        lambda df: preference_pairs(
            df, prompt, id_col, score,
            min_margin=float(arguments.get("min_margin", 0.0)),
            min_candidates=int(arguments.get("min_candidates", 2))))


@register_lens("chat_render")
def chat_render_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column (messages array), loss_role ("assistant"),
    out ("rendered"). Inverse drops the four outputs."""
    col = str(require_arg(arguments, "column", "chat_render"))
    loss_role = str(arguments.get("loss_role", "assistant"))
    out = str(arguments.get("out", "rendered"))

    def forward(df: DataFrame) -> DataFrame:
        if col not in df.columns:
            raise LensError(f"chat_render: no column '{col}'")
        return chat_render(df, col, loss_role=loss_role, out=out)

    def inverse(df: DataFrame) -> DataFrame:
        return df.drop(out, "n_turns", "loss_spans", "n_loss_tokens")

    return Lens("chat_render", arguments, forward, inverse)
