"""conversation_profile: hand-computed fixture."""

from __future__ import annotations

from datetime import datetime

from bm25_pagerank_rpi_spark.operators.conversations import conversation_profile

ROWS = [
    # conv_id, turn_idx, role, text, tool, ts
    ("c1", 0, "user", "hello world", "none", datetime(2025, 1, 1, 0, 0, 0)),
    ("c1", 1, "assistant", "hi there friend", "search", datetime(2025, 1, 1, 0, 0, 30)),
    ("c1", 2, "assistant", "", "search", datetime(2025, 1, 1, 0, 1, 0)),
    ("c1", 3, "tool", "result", "code", datetime(2025, 1, 1, 0, 2, 0)),
    ("c2", 0, "system", "be helpful", "none", datetime(2025, 1, 2)),
]
SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def test_conversation_profile(spark):
    out = {
        r["conv_id"]: r
        for r in conversation_profile(spark.createDataFrame(ROWS, SCHEMA)).collect()
    }
    c1 = out["c1"]
    assert c1["n_turns"] == 4
    assert c1["n_role_user"] == 1
    assert c1["n_role_assistant"] == 2
    assert c1["n_role_system"] == 0
    assert c1["n_role_tool"] == 1
    assert c1["n_tool_calls"] == 3
    assert c1["distinct_tools"] == 2  # search, code
    assert c1["total_tokens"] == 2 + 3 + 0 + 1
    assert c1["avg_turn_tokens"] == 1.5
    assert c1["duration_s"] == 120
    c2 = out["c2"]
    assert c2["n_turns"] == 1
    assert c2["n_tool_calls"] == 0
    assert c2["distinct_tools"] == 0
    assert c2["duration_s"] == 0
