"""Transcript-structure operators (operators/transcript_qa.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _conv(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_sft_pairs_normalized_roles_and_boundaries(spark):
    from fluent_bit_spark.operators.transcript_qa import sft_pairs

    df = _conv(
        spark,
        [
            ("c1", 0, "system", "sys"),
            ("c1", 1, "human", "q1"),       # human -> user
            ("c1", 2, "ai", "a1"),          # ai -> assistant
            ("c1", 3, "USER", "q2"),
            ("c1", 4, "function", "tool-out"),  # breaks the pair
            ("c2", 0, "user", "dangling"),  # last turn: no response
        ],
    )
    pairs = {
        (r.conv_id, r.prompt_idx): (r.prompt, r.response, r.response_idx)
        for r in sft_pairs(df).collect()
    }
    assert pairs == {("c1", 1): ("q1", "a1", 2)}


def test_role_sequence_qa_flags(spark):
    from fluent_bit_spark.operators.transcript_qa import role_sequence_qa

    df = _conv(
        spark,
        [
            # clean: system, user, assistant
            ("ok", 0, "system", "s"),
            ("ok", 1, "user", "u"),
            ("ok", 2, "assistant", "a"),
            # broken: two user turns in a row (via aliases), opens with tool
            ("bad", 0, "function", "t"),
            ("bad", 1, "human", "u1"),
            ("bad", 2, "USER", "u2"),
        ],
    )
    rows = {r.conv_id: r for r in role_sequence_qa(df).collect()}
    assert rows["ok"].structure_ok
    assert rows["ok"].n_same_role_adjacent == 0
    assert rows["ok"].first_role == "system" and rows["ok"].last_role == "assistant"
    assert not rows["bad"].structure_ok
    assert rows["bad"].n_same_role_adjacent == 1  # human->USER both normalize to user
    assert rows["bad"].first_role == "tool"
    assert rows["bad"].n_tool_turns == 1


def test_conv_dedup_by_opening_keeps_min(spark):
    from fluent_bit_spark.operators.transcript_qa import conv_dedup_by_opening

    df = _conv(
        spark,
        [
            ("c1", 0, "user", "hello"),
            ("c1", 1, "assistant", "hi"),
            ("c1", 2, "user", "DIVERGES here"),
            ("c3", 0, "user", "hello"),
            ("c3", 1, "assistant", "hi"),
            ("c3", 2, "user", "different tail"),  # same opening as c1 within k=2
            ("c2", 0, "user", "unrelated"),
        ],
    )
    out = {r.keep_conv: r.n_convs for r in conv_dedup_by_opening(df, k=2).collect()}
    assert out == {"c1": 2, "c2": 1}
