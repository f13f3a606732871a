"""Training-corpus assembly operators: the steps between a deduped
document pool and a training run — benchmark decontamination, mixture
quota sampling, and sequence packing. (LLM-data-pipeline extensions;
no reference counterpart — the reference stops at model features.)

Scale rules shared by all three:
- candidate joins ride short hash keys (never text);
- the benchmark side of decontamination is small by construction
  (eval sets are thousands of docs) and broadcasts;
- ordering is by portable md5 hash — deterministic across engines,
  partitionings, and reruns, unlike seeded RNG sampling;
- packing's running sum is windowed PER SHARD KEY (source), never a
  single global partition — the 100 TB version packs each shard
  independently, which is also what training-data loaders expect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.text.analysis import md5_hash32, md5_hash60, tokens
from flight_delay_prediction_using_pyspark_spark.text.dedup import shingles


def shingle_hashes(text_col: Column | str, n: int = 3) -> Column:
    """Distinct token n-gram shingles hashed to portable 32-bit longs
    — the join currency of decontamination (hashes shuffle, text
    never does)."""
    return F.transform(shingles(text_col, n), lambda s: md5_hash32(s))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    corpus_hashes: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ANY
    token n-gram with a benchmark/eval set, so training data can't
    memorize test answers. Returns the corpus with a boolean
    `contaminated` column.

    Plan: benchmark → explode shingle hashes → distinct (small);
    corpus → explode shingle hashes → LEFT SEMI join on the broadcast
    hash set → distinct contaminated ids → left join flag back. The
    corpus side shuffles only (id, hash) pairs; the broadcast side is
    the eval set's distinct shingle hashes (eval sets are tiny
    relative to any training corpus — if yours isn't, swap the
    broadcast for a bucketed shuffle join, the semantics hold).

    `corpus_hashes`: optional (id_col, sh_hashes array<long>) frame —
    e.g. the cached minhash-signature frame, whose sh_hashes are the
    SAME per-shingle md5 longs — skips the corpus-side tokenize +
    shingle + digest pass entirely. Ids absent from `corpus` are
    harmless (the flag attaches by left join); ids absent from
    `corpus_hashes` (sub-n-token docs) can never be flagged, exactly
    like their empty shingle set under the text path."""
    bench_hashes = (
        benchmark.select(F.explode(shingle_hashes(text_col, n)).alias("__h"))
        .distinct()
    )
    if corpus_hashes is not None:
        corpus_pairs = corpus_hashes.select(
            F.col(id_col), F.explode("sh_hashes").alias("__h")
        )
    else:
        corpus_pairs = corpus.select(
            F.col(id_col), F.explode(shingle_hashes(text_col, n)).alias("__h")
        )
    contaminated_ids = (
        corpus_pairs.join(F.broadcast(bench_hashes), "__h", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__contaminated", F.lit(True))
    )
    return (
        corpus.join(contaminated_ids, id_col, "left")
        .withColumn("contaminated", F.coalesce("__contaminated", F.lit(False)))
        .drop("__contaminated")
    )


def language_quota_sample(
    docs: DataFrame,
    quota: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mixture quota sampling: keep at most `quota` documents per
    stratum (language/source/domain), selected by deterministic
    md5-hash order — the reproducible way to rebalance a skewed corpus
    into a target mixture. One shuffle on the stratum; rank is a
    window, so heavy strata never materialize beyond the shuffle."""
    order = md5_hash32(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(order, id_col)
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style chunking: split each document into overlapping
    `chunk_tokens`-token windows (stride = chunk - overlap), one
    output row per chunk with a portable content hash — the unit of
    retrieval indexing. Pure JVM array ops (split → sequence →
    explode → slice → hash): no Python in the pipeline, and chunk
    boundaries are pure integer arithmetic, so chunking is
    deterministic across engines and partitionings. A short document
    yields exactly one (possibly short) chunk; the last window of a
    long document clamps to the end."""
    step = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks).cast("long")
    # integer ceil((n - chunk) / step) + 1, floored at 1
    extra = n - chunk_tokens + step - 1
    n_chunks = F.when(
        n <= chunk_tokens, F.lit(1).cast("long")
    ).otherwise(((extra - extra % step) / step).cast("long") + 1)
    chunked = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    chunk_toks = F.slice(
        F.col("__toks"), (F.col("chunk_id") * step + 1).cast("int"), chunk_tokens
    )
    return chunked.select(
        id_col,
        "chunk_id",
        F.size(chunk_toks).cast("long").alias("chunk_n_tokens"),
        md5_hash32(F.concat_ws(" ", chunk_toks)).alias("chunk_hash"),
    )


def span_dedup(
    docs: DataFrame,
    span_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style duplicated-span removal (Raffel et al. 2020 §2.2
    discards any three-sentence span seen before; here the span is a
    non-overlapping `span_tokens`-token window since the corpus has no
    sentence markers): across the WHOLE corpus, every distinct span
    keeps exactly its first occurrence — ordered by (doc_id, span_id)
    — and all later copies are cut, including later copies inside the
    same document. Returns one row per document: span counts before /
    after, surviving token count, and a portable hash of the re-joined
    surviving text (so the rewrite itself is verified, not just the
    bookkeeping).

    Plan shape (the 100 TB one): the only shuffled frame is
    (span_hash, doc_id, span_id) — 24 bytes a row, never text. One
    groupBy(span_hash).min(struct(doc_id, span_id)) picks winners (an
    associative agg with map-side partials — NOT a row_number window,
    which would sort every hash group), one groupBy(doc_id) folds
    winners back to a per-doc sorted id list, and one join against the
    token arrays rebuilds the surviving text map-side via slice +
    flatten. A hash shared by f documents costs f shuffled rows and an
    O(f) partial-min — no fan-out, no skew cliff.

    Span identity is the 60-bit md5 slice (analysis.md5_hash60): the
    former 32-bit key collides above ~10^5 distinct spans — i.e. on
    any realistic corpus — and a collision here DELETES unique text
    on both engines identically, so the oracle could never catch it.
    60 bits pushes the birthday bound to ~10^9 spans (< 1e-6 odds at
    10^6); the per-doc `kept_text_hash` stays 32-bit because it is a
    verification checksum, not a dedup decision."""
    toks = tokens(text_col)
    base = docs.select(F.col(id_col), toks.alias("__toks"))
    n_spans = F.expr(f"CAST((size(__toks) + {span_tokens - 1}) DIV {span_tokens} AS BIGINT)")
    spans = base.select(
        id_col,
        F.explode(F.sequence(F.lit(0).cast("long"), n_spans - 1)).alias("span_id"),
        "__toks",
    ).select(
        id_col,
        "span_id",
        md5_hash60(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("__toks"),
                    (F.col("span_id") * span_tokens + 1).cast("int"),
                    span_tokens,
                ),
            )
        ).alias("__h"),
    )
    kept_ids = (
        spans.groupBy("__h")
        .agg(F.min(F.struct(id_col, "span_id")).alias("w"))
        .select(F.col(f"w.{id_col}").alias(id_col), F.col("w.span_id").alias("span_id"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("span_id")).alias("__kept"))
    )
    with_kept = base.join(kept_ids, id_col, "left").withColumn(
        "__kept", F.coalesce("__kept", F.array().cast("array<long>"))
    )
    kept_toks = F.flatten(
        F.transform(
            F.col("__kept"),
            lambda i: F.slice(
                F.col("__toks"), (i * span_tokens + 1).cast("int"), span_tokens
            ),
        )
    )
    return with_kept.select(
        id_col,
        n_spans.alias("n_spans"),
        F.size("__kept").cast("long").alias("n_kept"),
        F.size(kept_toks).cast("long").alias("n_tokens_kept"),
        md5_hash32(F.concat_ws(" ", kept_toks)).alias("kept_text_hash"),
    )


def mixture_plan(
    docs: DataFrame,
    budget_tokens: int,
    domain_col: str = "lang",
    text_col: str = "text",
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Temperature-weighted mixture plan (the multinomial domain
    re-weighting of GPT-3 / XLM-R, temperature α = 1/2): per domain,
    sampling weight ∝ sqrt(token count), giving low-resource domains a
    super-proportional share. Emits one row per domain with token
    counts, the weight share in parts-per-`scale`, the planned token
    draw from `budget_tokens`, and planned epochs (milli-epochs —
    how many times the domain's data is traversed to fill its draw).

    α = 1/2 specifically because IEEE sqrt is correctly rounded —
    combined with a FIXED domain-order summation of the 5..100 weight
    doubles (a fold over a sorted in-row array, not a float SUM whose
    order the partitioning picks), every emitted number is
    bit-portable and the query sits under the exact-hash oracle gate.
    The plan is O(#domains) metadata: one grouped agg, one single-row
    reduce for the denominator, then a map over the domain rows —
    nothing here grows with corpus size except the first agg's input."""
    per = docs.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(text_col))).cast("long").alias("domain_tokens"),
    )
    weighted = per.withColumn("__w", F.sqrt(F.col("domain_tokens").cast("double")))
    one_row = weighted.agg(
        F.sort_array(
            F.collect_list(F.struct(domain_col, "n_docs", "domain_tokens", "__w"))
        ).alias("rows")
    ).withColumn(
        "__denom",
        F.aggregate("rows", F.lit(0.0), lambda acc, x: acc + x["__w"]),
    )
    return (
        one_row.select(F.explode("rows").alias("r"), "__denom")
        .select("r.*", "__denom")
        .select(
            domain_col,
            "n_docs",
            "domain_tokens",
            F.floor(F.lit(float(scale)) * F.col("__w") / F.col("__denom"))
            .cast("long")
            .alias("share_scaled"),
            F.floor(F.lit(float(budget_tokens)) * F.col("__w") / F.col("__denom"))
            .cast("long")
            .alias("planned_tokens"),
        )
        .withColumn(
            "epochs_milli", F.expr("planned_tokens * 1000 DIV domain_tokens")
        )
    )


def pack_sequences(
    docs: DataFrame,
    ctx_len: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end-to-end in
    deterministic (md5, id) order within each shard and cut the stream
    into `ctx_len`-token packs — `pack_id` is which pack a document
    STARTS in (documents may straddle a boundary, exactly like the
    standard causal-LM packing loader). Adds `n_tokens`, `pack_id`.

    Plan: one shuffle on the shard key, one running-sum window within
    it. Packing per shard (not globally) is deliberate: a global
    running sum would serialize through a single partition at 100 TB,
    while shard-local packing is embarrassingly parallel and matches
    how training shards are consumed."""
    n_tok = F.size(tokens(text_col))
    order = md5_hash32(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("__cum") - F.col("n_tokens")) / ctx_len).cast("long"),
        )
        .drop("__cum")
    )
