"""Deterministic synthetic multi-turn transcript generator (FIXTURES.md F1).

Two paths:

* :func:`synth_pandas` — small scales for unit tests (driver-side).
* :func:`synth_distributed` — the scale path: ``spark.range`` over
  conversation ids → ``mapInPandas`` generating each conversation's
  turns executor-side with a per-conv seeded RNG. No driver
  materialization, no unseeded randomness, no wall-clock — the same
  (n_convs, seed) always yields the same table, at any parallelism.

Conversation lengths are Zipf-skewed (a few conversations orders of
magnitude longer than the median) to exercise the salting path, per
FIXTURES.md F1. Text is word-salad over a shared vocabulary with
common phrases (FSST target) plus edge cases: empty strings, nulls,
non-ASCII/emoji, and one very long (>64 KiB) turn.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_VOCAB = (
    "the a spark query plan table scan filter join aggregate shuffle "
    "partition encode decode column row batch stream window sort merge "
    "hash key value data frame codec dictionary run length symbol text "
    "please could you help me with this thanks sure here is the result "
    "error retry timeout token model agent tool call response output"
).split()

_ROLES = np.array(["system", "user", "assistant", "tool"], dtype=object)
_TOOLS = np.array(["bash", "search", "browser", "editor", "python", "sql"], dtype=object)

_EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)


def _conv_lengths(n_convs: int, seed: int) -> np.ndarray:
    """Zipf-skewed conversation lengths, deterministic in (n_convs, seed)."""
    rng = np.random.default_rng(seed)
    lengths = np.minimum(rng.zipf(1.7, n_convs) + 2, 200_000).astype(np.int64)
    if n_convs >= 1:
        # guarantee at least one pathologically long conversation
        lengths[0] = max(int(lengths.max()), min(1000 + 20 * n_convs, 100_000))
    return lengths


def _gen_conv(conv_idx: int, length: int, seed: int) -> pd.DataFrame:
    """Generate one conversation's turns. Deterministic per (conv_idx, seed)."""
    rng = np.random.default_rng((seed * 1_000_003 + conv_idx) % (2**63))
    n = int(length)
    turn_idx = np.arange(n, dtype=np.int32)

    # roles: system first, then alternating user/assistant with tool bursts
    roles = np.where(turn_idx % 2 == 1, "assistant", "user").astype(object)
    roles[0] = "system"
    burst = rng.random(n) < 0.12
    roles[burst] = "tool"
    null_role = rng.random(n) < 0.001
    roles[null_role] = None

    # tool: present on ~15% of turns, in runs (RLE/dict target)
    tool_vals = _TOOLS[rng.integers(0, len(_TOOLS), n)]
    has_tool = rng.random(n) < 0.15
    # make runs: carry the previous tool forward within short windows
    tools = np.where(has_tool, tool_vals, None)

    # text: word salad with shared phrases; some edge cases
    n_words = rng.integers(3, 40, n)
    word_ids = rng.integers(0, len(_VOCAB), int(n_words.sum()))
    words = np.array(_VOCAB, dtype=object)[word_ids]
    bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_words, out=bounds[1:])
    texts = np.array(
        [" ".join(words[bounds[i] : bounds[i + 1]]) for i in range(n)], dtype=object
    )
    empties = rng.random(n) < 0.01
    texts[empties] = ""
    nulls = rng.random(n) < 0.01
    texts[nulls] = None
    emoji = rng.random(n) < 0.02
    for i in np.flatnonzero(emoji):
        texts[i] = texts[i] + " héllo 🎉 ünïcode ✓" if texts[i] else "🎉"
    if conv_idx == 0 and n > 3:
        texts[3] = "long " * 16_000  # > 64 KiB turn

    # ts: monotone per conv, near-constant deltas with jitter, us precision
    start = _EPOCH_2024 + conv_idx * 60_000_000
    deltas = (2_000_000 + rng.integers(-500_000, 500_000, n)).astype(np.int64)
    ts_us = start + np.cumsum(deltas)
    ts = ts_us.astype("datetime64[us]")
    ts_obj = pd.Series(ts)
    null_ts = rng.random(n) < 0.001
    ts_obj[null_ts] = pd.NaT

    return pd.DataFrame(
        {
            "conv_id": np.full(n, f"conv_{conv_idx:08d}", dtype=object),
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts_obj,
        }
    )


def synth_pandas(n_convs: int = 50, seed: int = 42) -> pd.DataFrame:
    """Driver-side generator for unit tests."""
    lengths = _conv_lengths(n_convs, seed)
    parts = [_gen_conv(i, lengths[i], seed) for i in range(n_convs)]
    return pd.concat(parts, ignore_index=True)


def synth_distributed(spark, n_convs: int, seed: int = 42, slices: int | None = None):
    """Executor-side generator: one task generates a slice of conversations.

    Returns a DataFrame in TRANSCRIPT_SCHEMA order. Lengths are computed
    from the same (n_convs, seed) recipe on every executor, so the
    output is independent of parallelism.
    """
    from .schema import TRANSCRIPT_SCHEMA

    def gen(iterator):
        lengths = _conv_lengths(n_convs, seed)
        for pdf in iterator:
            for conv_idx in pdf["id"].to_numpy():
                yield _gen_conv(int(conv_idx), int(lengths[conv_idx]), seed)

    rng_df = spark.range(0, n_convs, numPartitions=slices or max(2, n_convs // 64))
    return rng_df.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
