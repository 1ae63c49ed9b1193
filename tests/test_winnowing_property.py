"""Differential test: winnow_fingerprints vs an independent pure-
Python reference model, over seeded pseudo-random corpora with
planted shared runs — plus the winnowing guarantee on every planted
pair.  (Same pattern as test_dynamic_property's reference model: two
independent implementations must agree document-for-document.)
"""

from __future__ import annotations

import hashlib
import random
import re

from eventhub_to_timescale_spark.operators.winnowing import (
    winnow_fingerprints,
)

K, W = 5, 4
_TOKEN = re.compile(r"[a-z]+|[0-9]+")


def _model_fps(text: str, k: int = K, w: int = W) -> set[int]:
    """Pure-Python winnowing: tokenize, hash k-grams with the repo's
    md5 scheme, take each w-window's min, distinct."""
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        return set()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(("winnow" + g).encode()).hexdigest()[:8], 16)
        for g in grams
    ]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def _corpus(seed: int = 7, n: int = 60):
    rng = random.Random(seed)
    vocab = [f"w{j}" for j in range(40)]
    shared_run = " ".join(rng.choices(vocab, k=W + K - 1))  # length 8
    rows, planted = [], []
    for i in range(n):
        body = " ".join(rng.choices(vocab, k=rng.randint(0, 30)))
        if i % 10 in (3, 4):  # plant the run in pairs (3,4), (13,14)…
            text = f"{body} {shared_run}" if i % 2 else f"{shared_run} {body}"
            planted.append(i)
        else:
            text = body
        rows.append((i, text))
    pairs = [
        (planted[j], planted[j + 1]) for j in range(0, len(planted) - 1, 2)
    ]
    return rows, pairs


def test_spark_matches_python_model_and_guarantee(spark):
    rows, planted_pairs = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, K, W).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    want = {
        i: _model_fps(t) for i, t in rows if _model_fps(t)
    }
    assert got == want, "Spark and the Python model disagree"
    # guarantee: every planted pair (shared run of W+K-1 tokens)
    # shares at least one fingerprint
    assert planted_pairs
    for a, b in planted_pairs:
        assert got.get(a, set()) & got.get(b, set()), f"pair {(a, b)}"


def test_model_agreement_across_seeds(spark):
    """Three more seeds — different vocab mixes, lengths, and edge
    shapes (empty docs, sub-k docs) — all document-for-document."""
    for seed in (11, 23, 42):
        rows, _ = _corpus(seed=seed, n=40)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got: dict[int, set[int]] = {}
        for r in winnow_fingerprints(df, K, W).collect():
            got.setdefault(r["doc_id"], set()).add(r["fp"])
        want = {i: _model_fps(t) for i, t in rows if _model_fps(t)}
        assert got == want, f"seed {seed}"
