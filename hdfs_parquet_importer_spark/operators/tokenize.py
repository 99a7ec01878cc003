"""Shared tokenized-corpus intermediates (VERDICT r6 item 8).

Six registered queries (BM25, tf-idf, vocab coverage, CCNet buckets,
bigram perplexity, source overlap) each start by tokenizing
``documents.text`` — at 100 TB, tokenization is the dominant REPEATED
cost across a curation pipeline. Design decision, in two layers:

1. WITHIN one query, tokenize exactly once. The reusable intermediate
   is ``doc_term_counts``: the (doc_id, term, n) table — smaller than
   the exploded token stream (per-doc distinct terms), and every
   unigram statistic derives from it WITHOUT touching text again:
   corpus tf = re-aggregate over doc_id (partial-agg friendly), doc
   length = sum(n) per doc, per-doc scoring = one equi-join back.
   ``quality_ccnet_buckets`` rides this (it previously tokenized the
   corpus twice — once for tf, once for scoring).

2. ACROSS queries, the contract is tokenize-once-UPSTREAM: a real
   100 TB pipeline materializes (doc_id, term, n) — or the raw token
   array — ONCE as a bucketed-by-term (for posting-style consumers)
   or by-doc_id (for scoring consumers) table, and every downstream
   job reads that instead of text. This repo's queries stay
   self-contained because the driver contract runs each one
   independently against raw parquet; the operator boundary here is
   exactly where such a materialized view would slot in (pass any
   (doc_id, term, n)-shaped DataFrame instead). n-gram consumers
   (bigram LM, 8-gram overlap/contamination) need the ORDERED token
   array, so they derive from ``doc_tokens`` instead — n-gram tables
   are per-n and larger, so they are materialized per-query, not
   shared.

No reference-repo counterpart (the reference is a CSV->Parquet ETL);
the shapes follow the public inverted-index/posting-list literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators import dedup as D


def doc_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry, tokens array<string>) — ONE normalize+split per
    document, empty tokens dropped. Order-preserving: n-gram consumers
    slice this array. ``carry`` names per-document columns kept on the
    output row so downstream aggregates can group on them instead of
    joining them back by id (r13, guide §2.4: a carried column that is
    a function of the id adds zero groups and removes a shuffle)."""
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.filter(D.tokens(F.col(text_col)), lambda w: w != "").alias(
            "tokens"
        ),
    )


def doc_term_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry, term, n) term-frequency table — the shared unigram
    intermediate. One tokenize pass, one explode, one partial-agg
    shuffle keyed (id, term); everything unigram derives from this
    without re-reading text (module docstring). The explode happens
    AFTER the projection to (id, tokens), so the scan ships only the
    needed columns. ``carry`` rides per-document columns through the
    aggregation (see :func:`doc_tokens`) so consumers skip a join back
    by id — a column the id determines adds zero groups."""
    tok = doc_tokens(docs, id_col, text_col, carry=carry).select(
        id_col, *carry, F.explode("tokens").alias("term")
    )
    return tok.groupBy(id_col, *[F.col(c) for c in carry], "term").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def corpus_term_counts(doc_tf: DataFrame) -> DataFrame:
    """Corpus tf from the per-doc table: a re-aggregation (vocab-
    bounded output, map-side combine), NOT another corpus pass."""
    return doc_tf.groupBy("term").agg(F.sum("n").alias("c"))
