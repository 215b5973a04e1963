"""Fixture generator invariants (FIXTURES.md §1)."""

import numpy as np

from openlogparse_spark.fixtures.transcripts import generate_fixtures, generate_transcripts


def test_deterministic():
    a = generate_transcripts(5000)["transcripts"]
    b = generate_transcripts(5000)["transcripts"]
    assert a.equals(b)


def test_schema_and_key():
    fx = generate_fixtures(0.001)
    raw = fx["transcripts"]
    assert list(raw.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert raw.duplicated(["conv_id", "turn_idx"]).sum() == 0
    # dense turn_idx per conversation
    g = raw.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["turn_idx"]
    assert (g.max() + 1 == g.count()).all()


def test_skew_and_span():
    raw = generate_transcripts(60000)["transcripts"]
    counts = raw.groupby("conv_id").size()
    hot = counts["conv00000000"]
    assert hot / len(raw) > 0.015  # ~2% hot conversation
    span_h = (raw.ts.max() - raw.ts.min()).total_seconds() / 3600
    assert span_h >= 72
    assert set(raw.role.unique()) <= {"user", "assistant", "tool", "system"}
    # system only at turn 0 (a continuation piece may shift it to turn 1)
    assert (raw.loc[raw.role == "system", "turn_idx"] <= 1).all()


def test_split_and_corrupt_rates():
    raw = generate_transcripts(60000)["transcripts"]
    n_cont = raw.text.str.endswith("\\").sum()
    assert 0.001 < n_cont / len(raw) < 0.01
