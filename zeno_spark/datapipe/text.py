"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting.

All Spark-side logic is native ``pyspark.sql.functions`` / SQL
expressions — whole-stage-codegen end to end, zero Python in the hot
path.  Each operator has a DuckDB oracle builder using the same constants
and the same expression *shape* (same fold order, same integer
arithmetic), so results are bit-identical between engines.

Scale notes (100 TB corpus):
  * every operator is a narrow map over the documents scan — no shuffle,
    no UDF; Catalyst prunes the scan to (doc_id, text);
  * md5/conv/split run inside codegen; cost is O(bytes) per partition
    with no Python serialization;
  * fingerprints/hashes are the shuffle keys for the dedup tier
    (datapipe/dedup.py), so emitting them as a column here lets the
    downstream groupBy shuffle carry 8-byte keys instead of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shared constants — referenced by BOTH the Spark exprs and the oracle SQL
STOPWORDS = ("a", "the", "of", "to", "and", "in", "is", "on")
LANG_MARKERS = {
    "en": ("the", "a", "is", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "los", "las", "y"),
    "fr": ("le", "les", "et", "ou"),
    "zh": ("de", "shi", "le", "bu"),
}
_LANG_ORDER = ("en", "de", "es", "fr", "zh")  # deterministic argmax priority
# BPE-ish subtoken pattern: letter runs, digit runs, single other non-space
SUBTOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _sql_in(values: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{v}'" for v in values) + ")"


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token counts + distinct counts + BPE-ish subtoken count.

    Columns: doc_id, n_tokens, n_distinct, n_subtokens, n_chars.
    """
    toks = F.split(F.col(text_col), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{SUBTOKEN_RE}', 0)")).alias(
            "n_subtokens"
        ),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def token_stats_sql(table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           len(regexp_extract_all(text, '{SUBTOKEN_RE}')) AS n_subtokens,
           length(text) AS n_chars
    FROM {table}
    """


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

def quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document quality signals: type-token ratio, stopword ratio, mean
    token length, and a composite score.

    The score formula is a fixed expression tree (same associativity in
    the oracle) so the doubles are IEEE-identical across engines:
        score = ttr - stop_ratio + n_tokens / 1000.0
    """
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(
        f"cast(size(filter(split({text_col}, ' '), t -> t in ({stop_list}))) as long)"
    )
    ttr = n_distinct / n_tokens
    stop_ratio = n_stop / n_tokens
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        n_stop.alias("n_stop"),
        ttr.alias("ttr"),
        stop_ratio.alias("stop_ratio"),
        (ttr - stop_ratio + n_tokens / F.lit(1000.0)).alias("quality_score"),
    )


def quality_sql(table: str = "documents") -> str:
    stop = _sql_in(STOPWORDS)
    return f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct,
             len(list_filter(string_split(text, ' '), t -> t IN {stop}))::BIGINT AS n_stop
      FROM {table})
    SELECT doc_id, n_tokens, n_distinct, n_stop,
           n_distinct / n_tokens AS ttr,
           n_stop / n_tokens AS stop_ratio,
           n_distinct / n_tokens - n_stop / n_tokens + n_tokens / 1000.0
             AS quality_score
    FROM t
    """


# ---------------------------------------------------------------------------
# language identification
# ---------------------------------------------------------------------------

def langid(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language scorer: count per-language marker tokens,
    predict the argmax with a fixed priority order (en>de>es>fr>zh on
    ties; 'und' = undetermined when all scores are 0).

    A production pipeline swaps the marker lists for character-n-gram
    profiles — same dataflow (per-row scoring, no shuffle).
    """
    counts = {
        lang: F.expr(
            "size(filter(split({0}, ' '), t -> t in ({1})))".format(
                text_col, ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
            )
        ).alias(f"c_{lang}")
        for lang in _LANG_ORDER
    }
    scored = docs.select("doc_id", *counts.values())
    best = F.greatest(*[F.col(f"c_{lang}") for lang in _LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in _LANG_ORDER:
        pred = pred.when(F.col(f"c_{lang}") == best, F.lit(lang))
    return scored.select("doc_id", *[f"c_{lang}" for lang in _LANG_ORDER],
                         pred.alias("pred_lang"))


def langid_sql(table: str = "documents") -> str:
    count_cols = ",\n           ".join(
        "len(list_filter(string_split(text, ' '), t -> t IN {0})) AS c_{1}".format(
            _sql_in(LANG_MARKERS[lang]), lang
        )
        for lang in _LANG_ORDER
    )
    best = "greatest(" + ", ".join(f"c_{lang}" for lang in _LANG_ORDER) + ")"
    whens = "\n             ".join(
        f"WHEN c_{lang} = {best} THEN '{lang}'" for lang in _LANG_ORDER
    )
    return f"""
    WITH t AS (
      SELECT doc_id,
           {count_cols}
      FROM {table})
    SELECT doc_id, {", ".join(f"c_{lang}" for lang in _LANG_ORDER)},
           CASE WHEN {best} = 0 THEN 'und'
             {whens}
           END AS pred_lang
    FROM t
    """


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------

SHINGLE_K = 3  # words per shingle


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shingle fingerprint: min-md5 over rolling word 3-grams (the
    batch-friendly form of a rolling-hash fingerprint — the minimum of a
    rolling window of hashes, computed with array ops instead of a
    stateful scan).  Documents shorter than K words hash whole-text.
    Output: doc_id, fingerprint (hex string — identical in any engine).
    """
    toks = f"split({text_col}, ' ')"
    n = f"size({toks})"
    shingle_min = (
        f"array_min(transform(sequence(1, {n} - {SHINGLE_K - 1}), "
        f"i -> md5(concat_ws(' ', element_at({toks}, i), "
        f"element_at({toks}, i + 1), element_at({toks}, i + 2)))))"
    )
    return docs.select(
        "doc_id",
        F.expr(
            f"case when {n} >= {SHINGLE_K} then {shingle_min} "
            f"else md5({text_col}) end"
        ).alias("fingerprint"),
    )


def fingerprint_sql(table: str = "documents") -> str:
    toks = "string_split(text, ' ')"
    n = f"len({toks})"
    shingle_min = (
        f"list_min(list_transform(generate_series(1, {n} - {SHINGLE_K - 1}), "
        f"i -> md5({toks}[i] || ' ' || {toks}[i + 1] || ' ' || {toks}[i + 2])))"
    )
    return f"""
    SELECT doc_id,
           CASE WHEN {n} >= {SHINGLE_K} THEN {shingle_min}
                ELSE md5(text) END AS fingerprint
    FROM {table}
    """
