"""Agent-trajectory metrics (trajectory.py): hand-computed oracle on a
tiny scripted conversation, plus edge cases (no tool calls, single turn).

Reference analogue: per-segment fixed statistics as in
/root/reference/src/functionals/functionals.cpp:61-118 — here the
"signal" is the tool-call sequence of an agent transcript.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opensmile_spark.trajectory import trajectory_metrics


def _conv(spark, conv_id, turns, ts0=1_704_067_200.0, gap=10.0):
    """turns: list of (role, tool_or_None)."""
    rows = []
    for i, (role, tool) in enumerate(turns):
        rows.append((conv_id, i, role, tool, ts0 + i * gap))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, "
              "epoch double")
    return df.withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")


def test_trajectory_hand_oracle(spark):
    # scripted agent run: user -> assistant -> 3x same tool (a loop) ->
    # assistant -> 2x different tools -> assistant -> assistant (repeat!)
    turns = [
        ("user", None),          # 0
        ("assistant", None),     # 1   latency 10
        ("tool", "search"),      # 2
        ("tool", "search"),      # 3
        ("tool", "search"),      # 4   <- run of 3 (loop)
        ("assistant", None),     # 5   latency 10
        ("tool", "fetch"),       # 6
        ("tool", "calc"),        # 7
        ("assistant", None),     # 8   latency 10
        ("assistant", None),     # 9   latency 10, role repeat
    ]
    out = trajectory_metrics(_conv(spark, "c1", turns)).collect()[0]
    assert out["n_turns"] == 10
    assert out["n_tool_calls"] == 5
    assert out["n_distinct_tools"] == 3
    assert out["max_tool_run"] == 3          # search,search,search
    assert out["n_tool_loops"] == 1          # only the search run >= 3
    # adjacent same-role pairs: (2,3),(3,4),(6,7) tools, (8,9) = 4
    assert out["n_role_repeats"] == 4
    assert out["n_user_turns"] == 1
    assert out["n_assistant_turns"] == 4
    assert abs(out["mean_reply_latency_s"] - 10.0) < 1e-9


def test_trajectory_no_tools_and_single_turn(spark):
    df = _conv(spark, "a", [("user", None), ("assistant", None)]).unionAll(
        _conv(spark, "b", [("user", None)]))
    rows = {r["conv_id"]: r for r in trajectory_metrics(df).collect()}
    a, b = rows["a"], rows["b"]
    assert a["n_tool_calls"] == 0 and a["max_tool_run"] == 0
    assert a["n_tool_loops"] == 0 and a["n_distinct_tools"] == 0
    assert b["n_turns"] == 1 and b["n_role_repeats"] == 0
    assert b["mean_reply_latency_s"] is None  # no assistant turn


def test_conversation_fingerprints(spark):
    from opensmile_spark.trajectory import conversation_fingerprints

    rows = [
        # a and b: same role shape, different text
        ("a", 0, "user", "hi", None), ("a", 1, "assistant", "yo", None),
        ("b", 0, "user", "hey", None), ("b", 1, "assistant", "sup", None),
        # c: different shape
        ("c", 0, "user", "hi", None),
        # d: same CONTENT as a
        ("d", 0, "user", "hi", None), ("d", 1, "assistant", "yo", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string")
    struct_fp = {r["conv_id"]: r["conv_fp"] for r in
                 conversation_fingerprints(df, cols=("role",)).collect()}
    assert struct_fp["a"] == struct_fp["b"] == struct_fp["d"]
    assert struct_fp["c"] != struct_fp["a"]
    content_fp = {r["conv_id"]: r["conv_fp"] for r in
                  conversation_fingerprints(df).collect()}
    assert content_fp["a"] == content_fp["d"]
    assert content_fp["a"] != content_fp["b"]   # text differs
    # fingerprint is partitioning-independent (order comes from turn_idx,
    # not from physical row order)
    shuffled = {r["conv_id"]: r["conv_fp"] for r in
                conversation_fingerprints(
                    df.repartition(7).sortWithinPartitions("text")
                ).collect()}
    assert shuffled == content_fp


def test_extract_sft_pairs(spark):
    from opensmile_spark.trajectory import extract_sft_pairs

    rows = [
        ("c", 0, "system", "sys"),
        ("c", 1, "user", "q1"),
        ("c", 2, "assistant", "a1"),       # pair (q1, a1)
        ("c", 3, "assistant", "a2"),       # prev is assistant -> no turn pair
        ("c", 4, "user", "q2"),
        ("c", 5, "tool", "t"),
        ("c", 6, "assistant", "a3"),       # prev is tool -> no turn pair
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, "
                                     "role string, text string")
    turn = {(r["turn_idx"]): (r["prompt"], r["response"])
            for r in extract_sft_pairs(df).collect()}
    assert turn == {2: ("q1", "a1")}

    full = {r["turn_idx"]: r["prompt"]
            for r in extract_sft_pairs(df, context="full").collect()}
    # every assistant turn with history; prompt = all prior turns
    assert set(full) == {2, 3, 6}
    assert full[2] == "system: sys\nuser: q1"
    assert full[3] == "system: sys\nuser: q1\nassistant: a1"
    assert full[6].endswith("user: q2\ntool: t")
    # tail truncation keeps the chars nearest the response
    trunc = {r["turn_idx"]: r["prompt"]
             for r in extract_sft_pairs(
                 df, context="full", max_context_chars=8).collect()}
    assert trunc[2] == "user: q1"
    assert all(len(p) <= 8 for p in trunc.values())


def test_turn_novelty(spark):
    from opensmile_spark.trajectory import turn_novelty

    rows = [("c", 0, "kitten"), ("c", 1, "sitting"),  # lev 3 / max-len 7
            ("c", 2, "sitting"),                      # verbatim repeat
            ("c", 3, "")]                             # empty vs "sitting"
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, "
                                     "text string")
    out = {r["turn_idx"]: r["novelty"]
           for r in turn_novelty(df).collect()}
    assert out[0] == 1.0                       # first turn
    assert abs(out[1] - 3.0 / 7.0) < 1e-12
    assert out[2] == 0.0
    assert abs(out[3] - 1.0) < 1e-12           # total rewrite


def test_trajectory_interleaved_tool_runs(spark):
    # same tool NOT consecutive in the tool subsequence -> separate runs
    turns = [
        ("tool", "x"), ("assistant", None), ("tool", "x"),
        ("tool", "y"), ("tool", "x"),
    ]
    out = trajectory_metrics(_conv(spark, "c", turns)).collect()[0]
    # tool subsequence: x, x, y, x -> runs: [x,x], [y], [x]
    assert out["max_tool_run"] == 2
    assert out["n_tool_loops"] == 0
    assert out["n_distinct_tools"] == 2
