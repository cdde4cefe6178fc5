"""Transcript-payload training-data operators.

The engine's sink is a keyed table of conversation turns
(conv_id, turn_idx, role, text, tool, ts — BASELINE.json input_hint). These
operators turn that table into the artifacts an LLM training pipeline
actually consumes: one assembled document per conversation, and
(prompt, response) pairs for SFT. The reference stops at forwarding opaque
bytes to Kafka (/root/reference/mapper.go:10-20); these are the downstream
consumers' first moves, expressed Spark-first.

Scale shapes:
- ``assemble_conversations``: ONE key-grouped shuffle (groupBy conv_id,
  map-side combined collect_list); the turn ordering is a per-row
  ``array_sort`` bounded by conversation length — never a global orderBy.
  Any per-conversation document assembly is inherently bounded by the
  longest conversation; hot Zipf conversations (thousands of turns) are
  strings of ~MBs, not a skew problem for the group-by (one row out).
- ``sft_pairs``: key-partitioned window (lead over turn_idx within conv) —
  one hash exchange on conv_id, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_conversations(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """One training document per conversation: turns concatenated in stable
    ``turn_idx`` order as ``role: text`` lines.

    Returns (conv_id, n_turns, doc_text). Null texts render as an empty
    segment (``role: ``) so the output is deterministic and
    oracle-portable (DuckDB ``string_agg(... ORDER BY turn_idx)`` twin).
    """
    packed = turns.groupBy(conv_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(turn_col).alias("t"),
                    F.col(role_col).alias("r"),
                    F.col(text_col).alias("x"),
                )
            )
        ).alias("_ts"),
    )
    doc_text = F.array_join(
        F.transform(
            F.col("_ts"),
            lambda s: F.concat_ws(": ", s["r"], F.coalesce(s["x"], F.lit(""))),
        ),
        sep,
    )
    return packed.select(conv_col, "n_turns", doc_text.alias("doc_text"))


def sft_pairs(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    response_role: str = "assistant",
) -> DataFrame:
    """(prompt, response) extraction for SFT: every turn whose role is
    ``prompt_role`` immediately followed (by ``turn_idx`` order within the
    conversation) by a ``response_role`` turn.

    Returns (conv_id, prompt_turn, response_turn, prompt_text,
    response_text). Key-partitioned window — scale-safe."""
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(turn_col)
    lagged = turns.select(
        conv_col,
        F.col(turn_col).alias("prompt_turn"),
        F.col(role_col).alias("_role"),
        F.coalesce(F.col(text_col), F.lit("")).alias("prompt_text"),
        F.lead(turn_col).over(w).alias("response_turn"),
        F.lead(role_col).over(w).alias("_next_role"),
        F.coalesce(F.lead(text_col).over(w), F.lit("")).alias("response_text"),
    )
    return lagged.filter(
        (F.col("_role") == prompt_role) & (F.col("_next_role") == response_role)
    ).select(conv_col, "prompt_turn", "response_turn", "prompt_text", "response_text")
