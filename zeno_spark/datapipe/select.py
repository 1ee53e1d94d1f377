"""Corpus selection — the capstone of the training-data tier: compose
the quality, language, near-dup, and sampling signals into the actual
product every 100 TB crawl pipeline ships — the SELECTED training
corpus.

    selected = documents
        WHERE near-dup keep-mark = 1        (clusters.dedup_clusters)
          AND predicted language in LANGS   (text.langid)
          AND quality_score >= MIN_QUALITY  (text.quality)
          AND n_tokens >= MIN_TOKENS
          AND deterministic sample          (text.fingerprint nibble)

Each signal is an existing oracle-checked operator; this module only
joins their outputs, so the composition inherits their exactness and
the DuckDB mirror (`corpus_select_sql`) is the same derived tables
joined the same way — the driver gate then checks the INTEGRATION
(join keys, filter placement, threshold semantics), which is exactly
the layer bugs hide in once the parts are individually green.

Sampling discipline: no rand().  The sample key is the first hex
nibble of the WHOLE-TEXT md5 — a pure function of the text, identical
in any engine, stable across runs, and uniform.  (NOT the shingle
fingerprint: that is a MINIMUM over ~n_tokens hashes, so its leading
nibble is biased toward 0 by construction — at sf0.001, 453/500
fingerprints start with '0' — and the bias grows with document
length, which would make the "sample" a length filter.)  Keeping K of
the 16 nibbles gives a K/16 rate with per-document determinism, the
same reproducibility contract as every other operator here.

Scale notes (100 TB): quality/langid/fingerprint are narrow per-row
maps (no shuffle); the cluster keep-marks are the one iterative input
(see clusters.py scale notes); the final joins are all on doc_id, so
co-partitioning on doc_id makes them zero-exchange in a bucketed
layout — at production scale materialize the four signal tables
bucketed by doc_id, exactly like the `seen` table's layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zeno_spark.datapipe.clusters import dedup_clusters, dedup_clusters_sql
from zeno_spark.datapipe.text import (
    langid,
    langid_sql,
    quality,
    quality_sql,
)

MIN_QUALITY = 0.5
MIN_TOKENS = 10
LANGS = ("en",)
# 11 of 16 nibbles ~= a 69% deterministic sample
SAMPLE_NIBBLES = tuple("0123456789a")


def corpus_select(docs: DataFrame) -> DataFrame:
    """The selected training corpus over a documents table
    (doc_id, text, ...): one row per surviving document with its
    selection signals.  Output: doc_id, pred_lang, n_tokens,
    quality_score, cluster_size."""
    q = quality(docs).select("doc_id", "n_tokens", "quality_score")
    l = langid(docs).select("doc_id", "pred_lang")
    k = dedup_clusters(docs).select("doc_id", "keep", "cluster_size")
    f = docs.select(
        "doc_id", F.expr("substring(md5(text), 1, 1)").alias("__nib")
    )
    return (
        q.join(l, "doc_id")
        .join(k, "doc_id")
        .join(f, "doc_id")
        .filter(
            (F.col("keep") == 1)
            & F.col("pred_lang").isin(*LANGS)
            & (F.col("quality_score") >= F.lit(MIN_QUALITY))
            & (F.col("n_tokens") >= F.lit(MIN_TOKENS))
            & F.col("__nib").isin(*SAMPLE_NIBBLES)
        )
        .select("doc_id", "pred_lang", "n_tokens", "quality_score",
                "cluster_size")
    )


def corpus_select_sql(table: str = "documents") -> str:
    """DuckDB mirror: the same four signal queries as derived tables
    (the recursive cluster CTE nests as a subquery), joined on doc_id
    with the same thresholds."""
    langs = ", ".join(f"'{x}'" for x in LANGS)
    nibbles = ", ".join(f"'{x}'" for x in SAMPLE_NIBBLES)
    return f"""
    SELECT q.doc_id, l.pred_lang, q.n_tokens, q.quality_score,
           k.cluster_size
    FROM ({quality_sql(table)}) q
    JOIN ({langid_sql(table)}) l ON l.doc_id = q.doc_id
    JOIN ({dedup_clusters_sql(table)}) k ON k.doc_id = q.doc_id
    JOIN (SELECT doc_id, substr(md5(text), 1, 1) AS nib
          FROM {table}) f ON f.doc_id = q.doc_id
    WHERE k.keep = 1
      AND l.pred_lang IN ({langs})
      AND q.quality_score >= {MIN_QUALITY}
      AND q.n_tokens >= {MIN_TOKENS}
      AND f.nib IN ({nibbles})
    """
