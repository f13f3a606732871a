"""Learned quality-classifier scoring as expression (round-9 mandate):
model-based document filtering in the fastText style (Joulin et al.,
"Bag of Tricks for Efficient Text Classification", 2016) — hashed
unigram+bigram features · weight vector → logistic score — which is
the standard LLM-pipeline quality stage the rule-based stack
(doc_quality_buckets, doc_gopher_rule_census) does not cover: rules
encode thresholds someone wrote down; the classifier encodes a
LEARNED decision surface.

Division of labour, following the repo's bounded-artifact rule:

- TRAINING is driver-side pure Python (`train_quality_clf`) on a
  deterministic synthetic labeled fixture (`labeled_fixture`):
  positive docs use the corpus vocabulary diversely; negative docs
  hammer a small "spam" subset repetitively. A tiny fixed-epoch
  full-batch gradient-descent logistic regression — no numpy, no
  Spark, no randomness beyond a seeded generator — so the learned
  weight vector is a bit-reproducible constant of the codebase, the
  same way the BPE oracle's merge schedule is.
- The ARTIFACT is the integer-quantized weight vector: B=1024 hashed
  buckets, w_q[b] = round(Q·w[b]), bias likewise. Integer scores make
  the scoring bit-portable across engines (the repo-wide
  quantization discipline; sigmoid is monotone, so ranking and
  thresholding on the integer score equal the float decision).
- SCORING is a pure expression over any engine that can md5: bucket
  = md5-hash of the token (the engine-portable conv/substring
  pattern) mod B, score_q = bias_q + Σ w_q[bucket] over unigrams and
  bigrams — ONE aggregate() fold per doc inside whole-stage codegen,
  zero joins, zero Python (tokenizer-as-expression, the same shape
  as WordPiece inference). The DuckDB oracle replays scoring with
  the identical array literal; a pytest scores rows in pure Python
  (hashlib) and matches Spark bit-for-bit.

At 100 TB: scoring is map-only over one corpus pass; the weight
vector is ~8 KB inlined — far under every inline threshold measured
for the tokenizer family.
"""

from __future__ import annotations

import hashlib
import math
import random

#: Hashed feature buckets. 1024 keeps the array literal ~8 KB —
#: orders of magnitude under the measured inline ceilings.
N_BUCKETS = 1024

#: Weight quantization factor (the repo-wide portable discipline).
WEIGHT_Q = 1000

#: Corpus vocabulary (the synthetic documents tables' word list) —
#: the fixture draws from it so the learned weights say something
#: about real corpus text, not just about fixture-only tokens.
_VOCAB = [
    "spark", "join", "batch", "table", "window", "merge", "big",
    "data", "query", "small", "row", "slow", "stream", "filter",
    "sort", "hash", "agg", "scan", "fast", "value", "part", "key",
    "column", "group", "customer", "order", "line", "vector", "the",
    "a",
]

#: The "spam" subset negative docs hammer: buckets touched mostly by
#: these tokens (and their bigrams) learn negative weights.
_SPAMMY = ["slow", "row", "scan", "the", "a"]


def bucket(token: str, n_buckets: int = N_BUCKETS) -> int:
    """Engine-portable feature hash: first 8 hex digits of md5, mod
    B — equals Spark `conv(substring(md5(t),1,8),16,10) % B` and
    DuckDB `CAST(concat('0x', substr(md5(t),1,8)) AS BIGINT) % B`
    (verified by the cross-engine scoring query)."""
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % n_buckets


def features(text: str, n_buckets: int = N_BUCKETS) -> dict[int, int]:
    """Hashed unigram+bigram counts — the exact tokenization the
    scoring expression replays: lowercase whitespace tokens, bigrams
    joined with one space."""
    toks = text.strip().lower().split()
    x: dict[int, int] = {}
    for t in toks:
        b = bucket(t, n_buckets)
        x[b] = x.get(b, 0) + 1
    for t1, t2 in zip(toks, toks[1:]):
        b = bucket(t1 + " " + t2, n_buckets)
        x[b] = x.get(b, 0) + 1
    return x


def labeled_fixture(n_per_class: int = 120) -> list[tuple[str, int]]:
    """Deterministic labeled training set. Positive (quality=1) docs
    sample the full vocabulary near-uniformly (diverse types, varied
    bigrams); negative docs repeat a handful of spam-subset tokens
    (low type-token ratio, repetitive bigrams). Seeded Mersenne
    Twister → the fixture, hence the trained weights, are constants
    of the codebase."""
    rng = random.Random(42)
    out: list[tuple[str, int]] = []
    for _ in range(n_per_class):
        words = [rng.choice(_VOCAB) for _ in range(rng.randint(30, 60))]
        out.append((" ".join(words), 1))
    for _ in range(n_per_class):
        core = rng.sample(_SPAMMY, rng.randint(2, 3))
        words = [rng.choice(core) for _ in range(rng.randint(30, 60))]
        out.append((" ".join(words), 0))
    return out


def train_quality_clf(
    n_buckets: int = N_BUCKETS,
    epochs: int = 30,
    lr: float = 0.05,
) -> tuple[int, list[int]]:
    """Fixed-epoch full-batch GD logistic regression on the fixture →
    (bias_q, weights_q): the integer-quantized scoring artifact.
    Pure Python floats (IEEE doubles, deterministic iteration order),
    quantized once at the end."""
    data = [(features(t, n_buckets), y) for t, y in labeled_fixture()]
    w = [0.0] * n_buckets
    bias = 0.0
    n = len(data)
    for _ in range(epochs):
        gw = [0.0] * n_buckets
        gb = 0.0
        for x, y in data:
            z = bias + sum(w[b] * c for b, c in x.items())
            p = 1.0 / (1.0 + math.exp(-max(-30.0, min(30.0, z))))
            err = p - y
            gb += err
            for b, c in x.items():
                gw[b] += err * c
        bias -= lr * gb / n
        for b in range(n_buckets):
            if gw[b]:
                w[b] -= lr * gw[b] / n
    return (
        round(WEIGHT_Q * bias),
        [round(WEIGHT_Q * v) for v in w],
    )


_TRAINED: dict[int, tuple[int, list[int]]] = {}


def trained_weights_q(n_buckets: int = N_BUCKETS) -> tuple[int, list[int]]:
    """Memoized trained artifact (training is deterministic, ~100 ms;
    both the Spark query and the DuckDB oracle builder call this and
    get the same integers)."""
    if n_buckets not in _TRAINED:
        _TRAINED[n_buckets] = train_quality_clf(n_buckets)
    return _TRAINED[n_buckets]


def spark_score_expr(
    toks_col: str, bias_q: int, weights_q: list[int]
) -> str:
    """The scoring fold as a Spark SQL expression over a
    string-array column: bias + Σ w_q[bucket] over unigrams and
    bigrams, weight vector inlined as an array literal (bounded
    artifact), bucket = the engine-portable md5 hash. Whole-stage
    codegen, zero joins."""
    n = len(weights_q)
    w_arr = "array(" + ",".join(f"{v}L" for v in weights_q) + ")"
    buck = (
        "(CAST(conv(substring(md5({t}), 1, 8), 16, 10) AS BIGINT) "
        f"% {n})"
    )
    big_t = (
        f"concat(element_at({toks_col}, i), ' ', "
        f"element_at({toks_col}, i + 1))"
    )
    return f"""CAST({bias_q} AS BIGINT)
      + aggregate({toks_col}, CAST(0 AS BIGINT), (acc, x) ->
          acc + element_at({w_arr},
            CAST({buck.format(t='x')} + 1 AS INT)))
      + CASE WHEN size({toks_col}) >= 2 THEN
          aggregate(sequence(1, size({toks_col}) - 1), CAST(0 AS BIGINT),
            (acc, i) -> acc + element_at({w_arr},
              CAST({buck.format(t=big_t)} + 1 AS INT)))
        ELSE CAST(0 AS BIGINT) END"""


def score_q(text: str, bias_q: int, weights_q: list[int]) -> int:
    """Engine-free reference scorer: the exact integer the Spark fold
    and the DuckDB replay must both produce for `text`."""
    s = bias_q
    for b, c in features(text, len(weights_q)).items():
        s += weights_q[b] * c
    return s
