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
