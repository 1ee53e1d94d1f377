"""Corpus selection capstone (datapipe/select.py): the composed
selection must equal a row-level Python re-derivation from the
component operators' own outputs — verifying the integration layer
(join keys, filter placement, thresholds) the component tests can't
see.  The Spark-vs-DuckDB driver gate covers the same composition
against fully independent SQL."""

from __future__ import annotations

import pytest

import hashlib

from zeno_spark.datapipe import select as sel
from zeno_spark.datapipe.clusters import dedup_clusters
from zeno_spark.datapipe.text import langid, quality

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_corpus_select_matches_row_level_rederivation(spark, docs):
    q = {r.doc_id: r for r in quality(docs).collect()}
    l = {r.doc_id: r.pred_lang for r in langid(docs).collect()}
    k = {r.doc_id: r for r in dedup_clusters(docs).collect()}
    # independent sample-key derivation (stdlib md5, not the Spark expr)
    f = {
        r.doc_id: hashlib.md5(r.text.encode("utf-8")).hexdigest()
        for r in docs.select("doc_id", "text").collect()
    }

    expected = {
        d
        for d in q
        if k[d].keep == 1
        and l[d] in sel.LANGS
        and q[d].quality_score >= sel.MIN_QUALITY
        and q[d].n_tokens >= sel.MIN_TOKENS
        and f[d][0] in sel.SAMPLE_NIBBLES
    }
    got = sel.corpus_select(docs).collect()
    assert {r.doc_id for r in got} == expected
    # selection is strict: every predicate actually drops something at
    # this corpus (otherwise the test is vacuous for that signal)
    assert 0 < len(expected) < len(q)
    assert any(k[d].keep == 0 for d in q)
    assert any(l[d] not in sel.LANGS for d in q)
    assert any(f[d][0] not in sel.SAMPLE_NIBBLES for d in q)
    # signal columns ride along correctly
    for r in got:
        assert r.pred_lang == l[r.doc_id]
        assert r.n_tokens == q[r.doc_id].n_tokens
        assert r.cluster_size == k[r.doc_id].cluster_size
