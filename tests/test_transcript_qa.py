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


def test_pack_offsets_semantics(spark):
    from fluent_bit_spark.operators.packing import pack_offsets

    df = spark.createDataFrame(
        [
            # group g1: 3 docs of 6, 3, 4 tokens; capacity 8
            (1, "g1", "a b c d e f"),
            (2, "g1", "g h i"),
            (3, "g1", "j k l m"),
            (4, "g2", ""),          # empty doc
            (5, "g2", "x y"),
        ],
        ["doc_id", "source", "text"],
    )
    rows = {r.doc_id: r for r in pack_offsets(df, capacity=8).collect()}
    # doc1: [0,6) -> bin 0, no split; doc2: [6,9) -> bin 0, crosses into 1
    assert (rows[1].start_offset, rows[1].bin, rows[1].n_splits) == (0, 0, 0)
    assert (rows[2].start_offset, rows[2].bin, rows[2].n_splits) == (6, 0, 1)
    # doc3: [9,13) -> bin 1, no split
    assert (rows[3].start_offset, rows[3].bin, rows[3].n_splits) == (9, 1, 0)
    # empty doc occupies nothing; g2 ordering: doc4 (0 tokens) then doc5
    assert (rows[4].n_tokens, rows[4].n_splits) == (0, 0)
    assert (rows[5].start_offset, rows[5].bin) == (0, 0)


def test_pack_offsets_partition_invariance(spark):
    from fluent_bit_spark.operators.packing import pack_offsets

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", "w " * (i % 7 + 1)) for i in range(60)],
        ["doc_id", "source", "text"],
    )
    a = sorted(map(tuple, pack_offsets(df, 16).collect()))
    b = sorted(map(tuple, pack_offsets(df.repartition(7), 16).collect()))
    assert a == b


def test_chunk_documents_overlap_and_tail(spark):
    from fluent_bit_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    rows = [
        (r.doc_id, r.chunk_idx, r.chunk_start, r.n_chunk_tokens, r.chunk)
        for r in chunk_documents(df, size=8, stride=4)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    ]
    assert rows == [
        (1, 0, 0, 8, "t0 t1 t2 t3 t4 t5 t6 t7"),
        (1, 1, 4, 6, "t4 t5 t6 t7 t8 t9"),
        (1, 2, 8, 2, "t8 t9"),
        (2, 0, 0, 2, "a b"),  # short doc: single chunk
        # empty doc: no chunks
    ]


def test_chunk_documents_disjoint_covers_all_tokens(spark):
    from fluent_bit_spark.operators.packing import chunk_documents
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i))) for i in range(1, 40)],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, size=7)  # stride defaults to size: disjoint
    tot = (
        out.groupBy("doc_id")
        .agg(F.sum("n_chunk_tokens").alias("s"))
        .collect()
    )
    assert all(r.s == r.doc_id for r in tot)  # doc i has i tokens


def test_chunk_documents_validation(spark):
    import pytest
    from fluent_bit_spark.operators.packing import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(spark.range(1).withColumnRenamed("id", "doc_id"), 0)


def test_tool_transitions_null_transparent(spark):
    from fluent_bit_spark.operators.transcript_qa import tool_transitions

    df = spark.createDataFrame(
        [
            ("c1", 0, "search"),
            ("c1", 1, None),       # transparent: search -> editor
            ("c1", 2, "editor"),
            ("c1", 3, "editor"),
            ("c2", 0, "search"),   # conv boundary: no cross-conv pair
            ("c2", 1, "sql"),
        ],
        "conv_id string, turn_idx int, tool string",
    )
    out = {(r.from_tool, r.to_tool): r.n for r in tool_transitions(df).collect()}
    assert out == {
        ("search", "editor"): 1,
        ("editor", "editor"): 1,
        ("search", "sql"): 1,
    }


def test_dup_ngram_fraction_semantics(spark):
    from fluent_bit_spark.operators.curation import dup_ngram_fraction

    shared = "one two three four five"
    df = spark.createDataFrame(
        [
            (1, shared),                      # fully duplicated (with doc 2)
            (2, shared),
            (3, "six seven eight nine ten"),  # unique
            (4, "a b"),                       # too short for 5-grams: no row
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in dup_ngram_fraction(df, n=5).collect()}
    assert rows[1].dup_fraction == 1.0 and rows[1].n_grams == 1
    assert rows[2].dup_fraction == 1.0
    assert rows[3].dup_fraction == 0.0 and rows[3].n_dup_grams == 0
    assert 4 not in rows


def test_context_response_pairs_truncation_and_roles(spark):
    """Context = prior turns only, truncated to the LAST max tokens;
    only (normalized) assistant turns emit pairs."""
    from fluent_bit_spark.operators.transcript_qa import context_response_pairs

    rows = [
        ("c1", 0, "user", "one two three"),
        ("c1", 1, "ai", "resp-a"),          # normalized assistant
        ("c1", 2, "human", "four five"),
        ("c1", 3, "Assistant", "resp-b"),
        ("c2", 0, "assistant", "opener"),   # no prior context
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    out = {(r.conv_id, r.turn_idx): r for r in
           context_response_pairs(df, max_ctx_tokens=4).collect()}
    assert set(out) == {("c1", 1), ("c1", 3), ("c2", 0)}
    assert out[("c1", 1)].context == "one two three"
    assert out[("c1", 1)].n_ctx_tokens == 3
    # full prior = 'one two three resp-a four five' (6 tokens) -> last 4
    assert out[("c1", 3)].context == "three resp-a four five"
    assert out[("c1", 3)].n_ctx_tokens == 4
    assert out[("c2", 0)].context == "" and out[("c2", 0)].n_ctx_tokens == 0


def test_render_chat_deterministic_order_and_roles(spark):
    from fluent_bit_spark.operators.transcript_qa import render_chat

    rows = [
        ("c1", 1, "ai", "second"),
        ("c1", 0, "USER", "first"),  # out-of-order input
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = render_chat(df).collect()[0]
    assert out.n_turns == 2
    assert out.rendered == "<|user|>\nfirst\n<|assistant|>\nsecond"


def _conv_tool(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def test_funnel_steps_ordered_chain(spark):
    from fluent_bit_spark.operators.transcript_qa import funnel_steps

    df = _conv_tool(
        spark,
        [
            # full funnel; the tool turn BEFORE the first user turn must
            # not count, nor the assistant turn before the tool step
            ("c1", 0, "assistant", "hi", "search"),
            ("c1", 1, "human", "q", None),          # s1 = 1 (normalized)
            ("c1", 2, "ai", "thinking", None),      # assistant before s2: ignored
            ("c1", 3, "function", "out", "browser"),  # s2 = 3
            ("c1", 4, "ai", "answer", None),        # s3 = 4
            # user turn that itself carries a tool: strictly-after means
            # it cannot double as its own s2
            ("c2", 0, "user", "q", "search"),
            ("c2", 1, "tool", "out", "search"),     # s2 = 1
            ("c2", 2, "assistant", "a", None),      # s3 = 2
            # no user turn at all: nothing reached
            ("c3", 0, "system", "s", None),
            ("c3", 1, "assistant", "a", "search"),
            # funnel stalls after the tool step
            ("c4", 0, "user", "q", None),
            ("c4", 1, "tool", "out", "grep"),
            ("c4", 2, "user", "again?", None),
        ],
    )
    got = {
        r.conv_id: (r.step_user, r.step_tool, r.step_assist, r.converted)
        for r in funnel_steps(df).collect()
    }
    assert got == {
        "c1": (1, 3, 4, True),
        "c2": (0, 1, 2, True),
        "c3": (None, None, None, False),
        "c4": (0, 1, None, False),
    }


def test_echo_overlap_values_and_empty_response(spark):
    from fluent_bit_spark.operators.transcript_qa import echo_overlap

    df = _conv(
        spark,
        [
            ("c1", 0, "user", "alpha beta gamma"),
            ("c1", 1, "assistant", "alpha beta delta epsilon"),  # 2/4 distinct
            ("c2", 0, "user", "alpha beta"),
            ("c2", 1, "assistant", "alpha  alpha beta"),  # distinct = 2/2 echo
            ("c3", 0, "user", "question"),
            ("c3", 1, "assistant", "   "),  # empty response -> overlap 0.0
        ],
    )
    got = {
        r.conv_id: (r.n_resp_tokens, r.overlap, r.is_echo)
        for r in echo_overlap(df, threshold=0.6).collect()
    }
    assert got == {
        "c1": (4, 0.5, False),
        "c2": (2, 1.0, True),
        "c3": (0, 0.0, False),
    }


def test_cdc_chunks_insertion_stability_and_coverage(spark):
    """The CDC property: editing the middle of a document re-chunks
    only the neighborhood — chunk hashes away from the edit survive,
    unlike fixed-stride chunking where everything downstream shifts."""
    from fluent_bit_spark.operators.packing import cdc_chunks

    words = [f"w{i}" for i in range(400)]
    edited = words[:200] + ["INSERTED", "SENTENCE", "HERE"] + words[200:]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(edited))], "doc_id long, text string"
    )
    rows = cdc_chunks(df, window=3, divisor=32).collect()
    by_doc = {1: [], 2: []}
    for r in rows:
        by_doc[r.doc_id].append(r)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        # full coverage, no gaps/overlaps
        pos = 0
        for r in rs:
            assert r.chunk_start == pos
            assert r.n_chunk_tokens > 0
            pos += r.n_chunk_tokens
        assert pos == (400 if d == 1 else 403)
    h1 = {r.chunk_hash for r in by_doc[1]}
    h2 = {r.chunk_hash for r in by_doc[2]}
    shared = h1 & h2
    # chunks before AND after the edit point survive byte-identically
    assert len(shared) >= max(len(h1), len(h2)) - 3, (len(h1), len(h2), len(shared))
    # and at least one surviving chunk lies AFTER the edit (start > 203
    # in doc 2) — fixed-stride chunking could never achieve that
    after = {
        r.chunk_hash for r in by_doc[2] if r.chunk_start > 203
    } & {r.chunk_hash for r in by_doc[1] if r.chunk_start >= 200}
    assert after


def test_cdc_chunks_empty_and_single_token(spark):
    from fluent_bit_spark.operators.packing import cdc_chunks

    df = spark.createDataFrame(
        [(1, "   "), (2, "solo"), (3, None)], "doc_id long, text string"
    )
    rows = cdc_chunks(df).collect()
    got = {(r.doc_id, r.chunk_idx): (r.chunk_start, r.n_chunk_tokens) for r in rows}
    # blank and NULL docs emit nothing; a 1-token doc is one chunk
    assert got == {(2, 0): (0, 1)}


def test_sft_loss_mask_spans(spark):
    from fluent_bit_spark.operators.transcript_qa import sft_loss_mask

    df = spark.createDataFrame(
        [
            ("c", 0, "user", "hello there"),        # 2 tokens
            ("c", 1, "assistant", "hi how are you"),  # 4 tokens
            ("c", 2, "tool_use", "x"),               # 1 token
            ("c", 3, "assistant", ""),               # 0 tokens
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    rows = {r.turn_idx: r for r in sft_loss_mask(df).collect()}
    assert (rows[0].seg_start, rows[0].seg_len, rows[0].trainable) == (0, 2, False)
    assert (rows[1].seg_start, rows[1].seg_len, rows[1].trainable) == (2, 4, True)
    assert (rows[2].seg_start, rows[2].seg_len, rows[2].trainable) == (6, 1, False)
    # zero-length assistant span: start advances past turn 2's token
    assert (rows[3].seg_start, rows[3].seg_len, rows[3].trainable) == (7, 0, True)
    # spans tile the sequence exactly
    assert sum(r.seg_len for r in rows.values()) == 7


def test_dpo_pairs_extremes_and_tiebreaks(spark):
    from fluent_bit_spark.operators.transcript_qa import dpo_pairs

    df = spark.createDataFrame(
        [
            # p1: clear best (idx 2, score 9) and worst (idx 0, score 1)
            ("p1", 0, "worst", 1.0),
            ("p1", 1, "mid", 5.0),
            ("p1", 2, "best", 9.0),
            # p2: chosen ties break to the LOWEST cand, rejected to the
            # HIGHEST cand
            ("p2", 0, "a", 7.0),
            ("p2", 1, "b", 7.0),
            ("p2", 2, "c", 3.0),
            ("p2", 3, "d", 3.0),
            # p3: all scores equal -> no strict gap -> dropped
            ("p3", 0, "x", 4.0),
            ("p3", 1, "y", 4.0),
            # p4: single candidate -> dropped
            ("p4", 0, "solo", 8.0),
            # p5: NULL score excluded up front -> single survivor -> dropped
            ("p5", 0, "ok", 2.0),
            ("p5", 1, "nul", None),
        ],
        "prompt_id string, cand_id int, text string, score double",
    )
    out = {
        r["prompt_id"]: r
        for r in dpo_pairs(df, cand_col="cand_id").collect()
    }
    assert set(out) == {"p1", "p2"}
    assert (out["p1"]["chosen"], out["p1"]["rejected"]) == ("best", "worst")
    assert out["p1"]["score_gap"] == 8.0 and out["p1"]["n_cands"] == 3
    assert out["p2"]["chosen_cand"] == 0 and out["p2"]["rejected_cand"] == 3


def test_dpo_pairs_nan_scores_excluded(spark):
    from fluent_bit_spark.operators.transcript_qa import dpo_pairs

    df = spark.createDataFrame(
        [("p", 0, "good", 5.0), ("p", 1, "nan", float("nan"))],
        "prompt_id string, cand_id int, text string, score double",
    )
    # NaN sorts above every real score and NaN > 0 is true in Spark, so
    # without the isnan exclusion this would emit a NaN-gap pair.
    assert dpo_pairs(df, cand_col="cand_id", min_margin=100.0).count() == 0
    assert dpo_pairs(df, cand_col="cand_id").count() == 0


def test_dpo_pairs_min_margin(spark):
    from fluent_bit_spark.operators.transcript_qa import dpo_pairs

    df = spark.createDataFrame(
        [("p", 0, "lo", 1.0), ("p", 1, "hi", 2.0)],
        "prompt_id string, cand_id int, text string, score double",
    )
    assert dpo_pairs(df, cand_col="cand_id", min_margin=1.5).count() == 0
    assert dpo_pairs(df, cand_col="cand_id", min_margin=1.0).count() == 1


def test_tool_args_qa_flag_classes(spark):
    from fluent_bit_spark.operators.transcript_qa import (
        tool_args_qa,
        tool_args_report,
    )

    spec = {"search": (["query"], ["limit"]), "calc": (["expr"], [])}
    df = spark.createDataFrame(
        [
            ("c", 0, "search", '{"query": "x"}'),            # valid
            ("c", 1, "search", '{"query": "x", "limit": 3}'),# valid w/ optional
            ("c", 2, "search", '{"limit": 3}'),              # missing required
            ("c", 3, "search", '{"query": "x", "oops": 1}'), # unexpected
            ("c", 4, "search", '{"query": '),                # broken JSON
            ("c", 5, "search", "[1, 2]"),                    # non-object
            ("c", 6, "calc", '{"expr": "1+1"}'),             # valid
            ("c", 7, "unknown", "{}"),                       # no spec -> dropped
        ],
        "conv_id string, turn_idx int, tool string, args string",
    )
    qa = tool_args_qa(df, spec)
    rows = {(r["tool"], r["turn_idx"]): r for r in qa.collect()}
    assert len(rows) == 7  # unknown tool dropped
    assert rows[("search", 0)]["valid"] and rows[("search", 1)]["valid"]
    assert rows[("search", 2)]["n_missing"] == 1
    assert rows[("search", 3)]["n_unexpected"] == 1
    assert not rows[("search", 4)]["is_object"]
    assert rows[("search", 4)]["n_missing"] == 1  # all required count as missing
    assert not rows[("search", 5)]["is_object"]
    rep = {r["tool"]: r for r in tool_args_report(qa).collect()}
    assert rep["search"]["n_calls"] == 6 and rep["search"]["n_valid"] == 2
    assert rep["search"]["n_bad_json"] == 2
    assert rep["calc"]["valid_rate"] == 1.0


def test_best_of_n_selection(spark):
    from fluent_bit_spark.operators.transcript_qa import best_of_n

    rows = [
        ("c1", 0, "user", "q"),
        ("c1", 1, "assistant", "short"),
        ("c1", 2, "ai", "the much longer candidate"),  # ai -> assistant
        ("c1", 3, "assistant", "midlength one"),
        ("c2", 0, "assistant", "only"),
        ("c3", 0, "user", "no candidates here"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    out = best_of_n(df, k=1).collect()
    got = {r.conv_id: r for r in out}
    assert set(got) == {"c1", "c2"}  # c3 has no assistant turns
    assert got["c1"].turn_idx == 2 and got["c1"].n_candidates == 3
    assert got["c2"].rank == 1 and got["c2"].n_candidates == 1


def test_best_of_n_tiebreak_is_turn_idx(spark):
    from fluent_bit_spark.operators.transcript_qa import best_of_n

    rows = [("c", 5, "assistant", "aaaa"), ("c", 2, "assistant", "bbbb")]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    assert best_of_n(df, k=1).collect()[0].turn_idx == 2


def test_pack_greedy_semantics(spark):
    from fluent_bit_spark.operators.packing import pack_greedy

    docs = [
        (1, "s", "a b c"),        # 3 tokens -> bin 0 (fill 3)
        (2, "s", "d e"),          # +2 = 5 > 4 -> bin 1 (fill 2)
        (3, "s", "f g h i j k"),  # 6 > cap, bin alone -> bin 2
        (4, "s", "l"),            # previous overflowed -> bin 3
        (5, "t", "x y"),          # separate group restarts at bin 0
    ]
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    out = {r.doc_id: r for r in pack_greedy(df, capacity=4).collect()}
    assert [out[i].bin for i in (1, 2, 3, 4)] == [0, 1, 2, 3]
    assert out[3].fill_after == 6  # oversized doc sits alone, over cap
    assert out[5].bin == 0


def test_context_windows_overlap_and_tails(spark):
    from fluent_bit_spark.operators.transcript_qa import context_windows

    rows = [("c", i, "user", f"t{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    out = {r.window_no: r for r in context_windows(df, size=4, stride=2).collect()}
    # ranks 0..9: windows 0:[0,4) 1:[2,6) 2:[4,8) 3:[6,10) 4:[8,10)
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[0].text == "user: t0\nuser: t1\nuser: t2\nuser: t3"
    assert out[1].first_rank == 2 and out[1].n_turns == 4
    assert out[4].n_turns == 2  # partial tail window


def test_context_windows_rank_not_index(spark):
    from fluent_bit_spark.operators.transcript_qa import context_windows

    # gappy turn_idx must not tear windows: ranks are contiguous
    rows = [("c", i * 10, "u", f"t{i}") for i in range(4)]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    out = context_windows(df, size=4, stride=4).collect()
    assert len(out) == 1 and out[0].n_turns == 4
