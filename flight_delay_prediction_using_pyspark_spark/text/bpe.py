"""Distributed BPE tokenizer-vocabulary induction (Sennrich, Haddow &
Birch, "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016) — the one standard LLM training-data stage the catalog
lacked through round 7 (packing, dedup, quotas and DSIR exist;
tokenization was whitespace/regex only, text/analysis.py).

Design for 100 TB:

- ALL pair statistics run over the DISTINCT-WORD frequency table, not
  the token stream — the classic BPE trick. The corpus is touched by
  exactly ONE corpus-scale aggregation (word → freq); every training
  iteration after that is vocab-sized (≈100M–1B rows at web scale,
  trivially distributed), so induction cost is independent of corpus
  row count beyond the first groupBy.
- Each iteration is two shuffles over the vocab frame (adjacent-pair
  count, then the per-word merge rewrite's window) plus a ONE-ROW
  driver argmax — "merges are vocab-sized, not corpus-sized": the
  only driver state is the learned merge list itself (n_merges rows).
- The merge rewrite is window-only (no joins): greedy left-to-right
  non-overlap is resolved with a gaps-and-islands pass — overlapping
  matches can only chain when left==right (runs of one symbol), and
  greedy BPE takes every OTHER match in such a run, which is exactly
  `(pos - island_start) % 2 == 0`.
- APPLYING a learned vocabulary is a pure plan (bpe_apply): the
  merge list becomes literals, so segmentation of new text is one
  shuffle on word + a chain of window rewrites — broadcastable
  against a corpus as a word→segmentation dimension join.
- Per-iteration state caching is SIZE-GATED (see bpe_train): a
  web-scale vocab persists each iteration so training never re-runs
  more than one iteration's lineage; a small vocab recomputes in one
  pipelined stage instead of pinning K AQE-frozen caches.
- wordpiece_segment adds the OTHER standard inference algorithm over
  the same induced inventory: greedy longest-match-first (WordPiece,
  Wu et al. 2016), a pure plan with no driver feedback.

Production note: at very large vocabularies, practical trainers batch
several non-interacting merges per round to cut iteration count; this
implementation takes one merge per round (the exact textbook
algorithm) so results are deterministic and oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): the single corpus-scale aggregation.
    Lower-cased whitespace tokens (the corpus' shared pre-tokenizer,
    text/analysis.tokens)."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def char_state(words: DataFrame) -> DataFrame:
    """(word, freq) → the initial symbol state (word, freq, pos, sym):
    one row per character, pos 1-based. Guard: F.sequence(1, 0)
    DESCENDS for empty words (unlike SQL generate_series, which is
    empty) — filter them; a zero-length word has no symbols."""
    return (
        words.filter(F.length("word") >= 1)
        .select(
            "word",
            "freq",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"),
        )
        .select(
            "word",
            "freq",
            F.col("pos").cast("long").alias("pos"),
            F.expr("substring(word, pos, 1)").alias("sym"),
        )
    )


def pair_counts(state: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-symbol pair counts over the vocab-grain
    state — the distributed statistic each merge selection reads."""
    w = Window.partitionBy("word").orderBy("pos")
    return (
        state.select(
            F.col("sym").alias("a"),
            F.lead("sym").over(w).alias("b"),
            "freq",
        )
        .filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def apply_merge(state: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every word's symbol sequence with one merge (a,b)→ab,
    greedy left-to-right non-overlapping, as a pure window plan.

    Overlap note: a match at pos p and p+1 simultaneously is only
    possible when a == b (runs of one symbol); greedy takes every
    other match inside such a run. A match row's island start is the
    first match position after the last NON-match position — a
    running MAX over the same (word, pos) window every other step
    here already uses, so the whole rewrite is ONE exchange + sort
    with all five window functions chained in a single stage (an
    island-id formulation needs a second partitioning). The row AFTER
    a merge start is consumed; positions are re-densified for the
    next round."""
    w = Window.partitionBy("word").orderBy("pos")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = state.select(
        "word",
        "freq",
        "pos",
        "sym",
        F.coalesce(
            (F.col("sym") == F.lit(a)) & (F.lead("sym").over(w) == F.lit(b)),
            F.lit(False),
        ).alias("match"),
    )
    started = marked.withColumn(
        "is_start",
        F.col("match")
        & (
            (
                F.col("pos")
                - F.coalesce(
                    F.max(
                        F.when(~F.col("match"), F.col("pos"))
                    ).over(cum),
                    F.lit(0),
                )
                - 1
            )
            % 2
            == 0
        ),
    )
    kept = started.withColumn(
        "gone", F.coalesce(F.lag("is_start").over(w), F.lit(False))
    ).filter(~F.col("gone"))
    return kept.select(
        "word",
        "freq",
        F.row_number().over(w).cast("long").alias("pos"),
        F.when(F.col("is_start"), F.lit(a + b)).otherwise(F.col("sym")).alias(
            "sym"
        ),
    )


def bpe_train(
    words: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn `n_merges` BPE merges over a (word, freq) vocabulary.

    Returns (merges, final_state): merges as
    [(rank, left, right, pair_count)] — the driver-side list is
    bounded by n_merges, never by data — and the LAZY final symbol
    state (callers aggregate it or ignore it). Tie-break on
    (count DESC, left ASC, right ASC): exact integer counts make the
    learned vocabulary bit-portable across engines.

    Iteration-state caching is SIZE-GATED (the
    scratch_persist_if_large economics): persisting every iteration
    pins K cached plans at full shuffle fan-out that AQE can no
    longer coalesce — at small vocab sizes that scheduling overhead
    exceeds the O(K²) window-recompute it avoids, because every
    rewrite shares one (word, pos) partitioning and the un-persisted
    recompute is a single pipelined stage. Past the estimate
    threshold (a web-scale vocab) the recompute dominates and the
    per-iteration persist flips on; superseded states are released
    once their successor is the selection input, and intermediates
    are fully unpersisted before return (the returned frame replays
    the merge literals — a pure plan)."""
    from flight_delay_prediction_using_pyspark_spark.operators.relational import (
        plan_size_bytes,
    )

    merges: list[tuple[int, str, str, int]] = []
    state = char_state(words)
    est = plan_size_bytes(state)
    cache_iters = est is None or est >= 8 * 1024 * 1024
    cached = []
    for rank in range(1, n_merges + 1):
        best = (
            pair_counts(state)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .first()
        )
        if best is None:
            break
        merges.append((rank, best["a"], best["b"], int(best["cnt"])))
        state = apply_merge(state, best["a"], best["b"])
        if cache_iters:
            state = state.persist()
            cached.append(state)
            # the pair_counts action above materialized the PREVIOUS
            # iteration's cache; once two behind, nothing reads it.
            if len(cached) > 2:
                cached.pop(0).unpersist()
    final = bpe_apply(words, [(m[1], m[2]) for m in merges])
    for df in cached:
        df.unpersist()
    return merges, final


def bpe_apply(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Segment a (word, freq) vocabulary with an already-learned merge
    list — the production path for new text: merges are literals, so
    the whole segmentation is ONE shuffle on word plus a window chain
    (no per-iteration actions, no driver state). Corpus-scale use
    joins the output back to the token stream as a broadcast
    word→segmentation dimension."""
    state = char_state(words)
    for a, b in merges:
        state = apply_merge(state, a, b)
    return state


def wordpiece_segment(
    words: DataFrame,
    merges: list[tuple[str, str]],
    max_pieces: int = 8,
    inventory: list[str] | None = None,
) -> DataFrame:
    """Greedy longest-match-first segmentation (the WordPiece
    INFERENCE algorithm, Wu et al. 2016 — what BERT-family tokenizers
    run at serving time) of a (word, freq) vocabulary against the
    symbol inventory induced by BPE training: base alphabet ∪ merged
    units. Returns (word, freq, remaining, n_pieces, sig) where `sig`
    is the '|'-joined piece sequence; `remaining` is non-empty only
    for words longer than `max_pieces` pieces (the standard long-word
    truncation guard production tokenizers apply).

    This is a MAP-ONLY projection — tokenizer-as-expression. The
    inventory is a TOKENIZER ARTIFACT (alphabet ∪ merged units,
    bounded by the unicode alphabet plus the merge count, never by
    the corpus), so it is collected once (same bounded-driver-state
    rule as the merge list) and becomes an array LITERAL inside a
    single `aggregate()` fold over `max_pieces` steps: each step
    takes the longest inventory entry prefixing the remaining suffix
    (`array_max` over `struct(length, piece)` — equal-length matches
    at one position are equal strings, so the max is unique) and
    advances the (remaining, n_pieces, sig) accumulator. Everything
    runs inside whole-stage codegen: zero joins, zero windows, zero
    shuffles beyond whatever built the input vocabulary frame. An
    earlier relational formulation (per-round prefix explode →
    broadcast-inventory equi-join → per-word window) produced the
    same rows through ~18 broadcast/sort stages of pure scheduling
    latency; with the inventory already driver-resident there is
    nothing distributed left to coordinate per round. At inventories
    too large to inline (≫10⁵ entries), swap the literal for a
    mapInPandas trie pass — the documented escape hatch.

    `inventory` is the production parameter: pass the SHIPPED piece
    list (alphabet ∪ merged units from the training corpus) to
    segment NEW text with a frozen vocabulary; None derives the
    alphabet from `words` itself (the train-and-apply-on-same-corpus
    path the catalog queries use). Out-of-inventory characters —
    possible only with a shipped inventory meeting foreign text —
    fall back to consuming one character as its own piece (the
    char-fallback analogue of byte-fallback in production tokenizers),
    so segmentation is total and never folds to a NULL state.

    Note: merge-replay (BPE inference, `bpe_apply`) and longest-match
    (WordPiece inference) are DIFFERENT segmenters that happen to
    share a vocabulary — quantifying their disagreement is exactly
    what the agreement census query exists for."""
    if inventory is not None:
        vocab_syms = sorted(set(inventory))
    else:
        alphabet = {
            r["sym"]
            for r in char_state(words).select("sym").distinct().collect()
        }
        vocab_syms = sorted(alphabet | {a + b for a, b in merges})

    def _q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    inv = "array(" + ",".join(_q(v) for v in vocab_syms) + ")"
    best = (
        f"coalesce(array_max(transform(filter({inv}, "
        "v -> v = substring(acc.remaining, 1, length(v))), "
        "v -> struct(length(v) AS l, v AS p))).p, "
        "substring(acc.remaining, 1, 1))"
    )
    fold = f"""aggregate(
      sequence(1, {max_pieces}),
      struct(word AS remaining, CAST(0 AS BIGINT) AS n_pieces,
             CAST('' AS STRING) AS sig),
      (acc, i) -> CASE WHEN acc.remaining = '' THEN acc ELSE struct(
        substring(acc.remaining, length({best}) + 1) AS remaining,
        acc.n_pieces + CAST(1 AS BIGINT) AS n_pieces,
        CASE WHEN acc.sig = '' THEN {best}
             ELSE concat(acc.sig, '|', {best}) END AS sig) END)"""
    return (
        words.filter(F.length("word") >= 1)
        .withColumn("__wp", F.expr(fold))
        .select(
            "word",
            "freq",
            F.col("__wp.remaining").alias("remaining"),
            F.col("__wp.n_pieces").alias("n_pieces"),
            F.col("__wp.sig").alias("sig"),
        )
    )
