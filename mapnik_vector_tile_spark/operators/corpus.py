"""Composed training-corpus filter — the end-to-end selection a
pre-training pipeline runs before tokenization: exact-dedup keepers
∩ quality gates ∩ language-ID, reported per predicted language.

No reference counterpart (the reference is a tile codec); this is the
task brief's "operations a large-scale training-data pipeline would
need", composed from operators.dedup and operators.textstats so the
whole chain stays pure DataFrame algebra (JVM/codegen end-to-end).

Scale story (100 TB corpus): the dedup keeper set is one groupBy on
the text hash-shuffle; quality + langid are narrow per-row column
math fused into the same scan by Catalyst; the three joins are
equi-joins on doc_id that AQE plans (the keeper side shrinks to
|distinct texts| rows, broadcastable below the threshold). Nothing
here touches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.operators.dedup import with_self_copies
from mapnik_vector_tile_spark.operators.textstats import langid, quality_stats

# gates calibrated to the synthetic corpus (n_tokens 10..99,
# alpha_ratio 0.79..0.86) so the filter actually cuts: ~43% of docs
# drop at sf0.01 — a vacuous keep-everything gate would make the
# oracle match prove nothing
MIN_TOKENS = 20
MIN_ALPHA = 0.82
TOKEN_BAND = 20


def corpus_filter_stats(
    docs: DataFrame,
    min_tokens: int = MIN_TOKENS,
    min_alpha: float = MIN_ALPHA,
    max_dup2_frac: float | None = None,
) -> DataFrame:
    """Stats of the retained corpus per (predicted language,
    token-count band): drop exact dups (keeper = min doc_id per text
    over docs ∪ shifted-copy — the same harness the dedup queries
    use), drop low-quality docs (token and alpha-ratio floors), group
    what survives.

    ``max_dup2_frac`` adds the Gopher-style intra-doc repetition gate
    (textstats.repetition_stats): docs whose duplicate-2-gram fraction
    exceeds the cap are cut — the filter that removes boilerplate/
    self-concatenated pages a corpus crawl always contains. Off by
    default (the base oracle pins the 3-gate composition; the
    repetition-gated composition is pinned by q_corpus_filter_rep)."""
    keepers = (
        with_self_copies(docs)
        .groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    q = quality_stats(docs)
    l = langid(docs).select("doc_id", "pred_lang")
    kept = (
        docs.select("doc_id")
        .join(keepers, "doc_id", "left_semi")
        .join(q, "doc_id")
        .join(l, "doc_id")
        .filter(
            (F.col("n_tokens") >= F.lit(min_tokens))
            & (F.col("alpha_ratio") >= F.lit(min_alpha))
        )
    )
    if max_dup2_frac is not None:
        from mapnik_vector_tile_spark.operators.textstats import (
            repetition_stats,
        )

        rep = (
            repetition_stats(docs, ns=(2,))
            .select("doc_id", "dup_frac")
        )
        kept = (
            kept.join(rep, "doc_id")
            .filter(F.col("dup_frac") <= F.lit(float(max_dup2_frac)))
            .drop("dup_frac")
        )
    return kept.withColumn(
        "tok_band",
        F.floor(F.col("n_tokens") / F.lit(TOKEN_BAND)).cast("bigint"),
    ).groupBy("pred_lang", "tok_band").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.sum("len_chars").cast("bigint").alias("sum_chars"),
    )


def chunk_sliding(
    docs: DataFrame,
    chunk_words: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """T33 sliding-window chunking — the retrieval/RAG indexing cut
    (fixed-size windows with overlap so no answer span straddles a
    boundary unseen), distinct from chunk_dedup's disjoint paragraph
    proxy: chunk i covers words [i·stride, i·stride + chunk_words)
    with stride = chunk_words − overlap; the last window is allowed
    short, and a doc shorter than one window yields exactly one chunk.
    n_chunks = max(1, ceil((n_words − overlap) / stride)) — the unique
    count that covers every word with the final window still holding
    ≥ overlap words of context.

    Pure Column math (split / sequence / slice / array_join inside
    codegen) — a narrow projection with NO shuffle and no Python;
    the 1→N fan-out happens in the explode. Output:
    (doc_id, chunk_idx, chunk_text, n_words)."""
    if not 0 <= overlap < chunk_words:
        raise ValueError("chunk_sliding: need 0 <= overlap < chunk_words")
    stride = chunk_words - overlap
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.array_join(
                F.slice(w, i * stride + 1, chunk_words), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_words), n - i * stride
            ).cast("long").alias("n_words"),
        ),
    )
    return docs.select(
        F.col(id_col), F.explode(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_words").alias("n_words"),
    )
