"""Document-level deduplication: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Spark-first design, all JVM-side (no Python UDFs anywhere):

  * exact         — content-hash groupBy: the shuffle key is sha256(text)
                    (8+32 bytes), never the document body;
  * jaccard       — EXACT prefix-filtered set-similarity join (the
                    All-Pairs/PPJoin principle): only each doc's
                    rarest-token prefix enters pair generation, plus
                    the length filter; identical output to the naive
                    posting self-join by theorem (equality-tested, and
                    the DuckDB oracle runs the naive form).  Integer
                    threshold arithmetic (t_num*union <= t_den*inter),
                    no float compare;
  * minhash+LSH   — K=16 permutations over a 61-bit token hash reduced
                    mod P, banded 4x4; candidate pairs = band-bucket
                    join; every candidate is verified with the exact
                    Jaccard join (LSH is a *prefilter*, like the crawl
                    tier's bloom: it can only shrink work, never change
                    the verified result set's correctness);
  * simhash       — 32-bit sign-of-sums signature; near-dup pairs found
                    with the pigeonhole block join (4 blocks of 8 bits:
                    hamming<=3 guarantees at least one equal block), so
                    the pair search is an equi-join, NOT a cross join —
                    exact and scalable.

Scale notes (100 TB):
  * posting-list joins key on the token md5 (8 bytes); a df-cap (drop
    tokens appearing in more than DF_CAP docs) bounds the worst posting
    list, exactly like stopword pruning in web-scale near-dup systems —
    the cap is part of the operator's declared semantics and the oracle
    applies the same cap;
  * LSH bands and simhash blocks turn O(n^2) pair generation into
    equi-joins on short keys; AQE skew-join handles hot buckets.

Every operator ships a DuckDB oracle built from the SAME constants.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared constants (Spark exprs AND oracle SQL read these)
# ---------------------------------------------------------------------------

P = 1_000_000_007  # token-hash modulus; keeps a_i*h + b_i inside int64
MINHASH_K = 16     # permutations
LSH_BANDS = 4      # 4 bands x 4 rows
LSH_ROWS = MINHASH_K // LSH_BANDS
SIMHASH_BITS = 32
SIMHASH_BLOCKS = 4            # pigeonhole blocks (8 bits each)
SIMHASH_MAX_HAMMING = 3       # <= blocks-1 so pigeonhole is complete
DF_CAP = 10_000               # posting-list document-frequency cap

_rng = random.Random(42)
PERM_A = [_rng.randrange(1, P) for _ in range(MINHASH_K)]
PERM_B = [_rng.randrange(0, P) for _ in range(MINHASH_K)]

# 61-bit token hash from md5 (15 hex digits), reduced mod P.
# Spark: conv() hex->decimal string -> bigint.  DuckDB: 0x-cast.
_TOKHASH_SPARK = "cast(conv(substring(md5({t}), 1, 15), 16, 10) as bigint) % {p}"
_TOKHASH_SQL = "(('0x' || substr(md5({t}), 1, 15))::BIGINT % {p})"


def tokhash_spark(t: str = "t") -> str:
    return _TOKHASH_SPARK.format(t=t, p=P)


def tokhash_sql(t: str = "t") -> str:
    return _TOKHASH_SQL.format(t=t, p=P)


# ---------------------------------------------------------------------------
# exact dedup — hash groupBy
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group identical texts by content hash; keep the smallest doc_id as
    the canonical representative.  Output: content_hash, keep_doc_id,
    n_copies.  (D8's payload dedupe from the crawl tier, applied to
    text.)"""
    return (
        docs.select(F.sha2(F.col(text_col), 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_sql(table: str = "documents") -> str:
    return f"""
    SELECT sha256(text) AS content_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM {table}
    GROUP BY sha256(text)
    """


# ---------------------------------------------------------------------------
# n-gram (word) Jaccard via inverted index
# ---------------------------------------------------------------------------

def _posting(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, token) over DISTINCT tokens per doc, df-capped."""
    posting = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("token"),
    )
    df_ok = (
        posting.groupBy("token")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= DF_CAP)
        .select("token")
    )
    return posting.join(df_ok, "token", "inner")


def _verify_pairs_arrays(
    cand: DataFrame, posting: DataFrame, t_num: int, t_den: int
) -> DataFrame:
    """Exact Jaccard verify restricted to the candidate pair set: join
    each pair to its two (df-capped, distinct) token arrays and
    intersect IN CODEGEN — each candidate crosses the wire exactly
    once.  Best when the candidate plan does NOT already contain the
    posting subtree (minhash-LSH: candidates come from signatures;
    measured 15-24s vs 25-26s fan-out at 4.4M pairs, sf0.1).  For
    posting-derived candidates (prefix filter) use
    `_verify_pairs_fanout`, whose posting exchanges Catalyst reuses
    across the cand and verify subtrees (measured 2x faster there).
    Output: doc_a, doc_b, n_inter, n_union (threshold applied, integer
    cross-multiplied — no float compare).  The n_union > 0 guard keeps
    parity with the fan-out form for degenerate pairs whose every
    token was df-capped away (a shared-empty-signature LSH bucket can
    propose them)."""
    toks = posting.groupBy("doc_id").agg(
        F.collect_list("token").alias("toks"),
        F.count(F.lit(1)).alias("n_set"),
    )
    ta = toks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("__ta"),
        F.col("n_set").alias("na"),
    )
    tb = toks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("__tb"),
        F.col("n_set").alias("nb"),
    )
    from zeno_spark.datapipe.partitioning import spread_for_join

    return (
        spread_for_join(cand, "doc_a")
        .join(spread_for_join(ta, "doc_a"), "doc_a")
        .join(tb, "doc_b")
        .withColumn(
            "n_inter",
            F.size(F.array_intersect("__ta", "__tb")).cast("long"),
        )
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_inter"))
        .filter(
            (F.col("n_union") > 0)
            & (F.lit(t_den) * F.col("n_inter") >= F.lit(t_num) * F.col("n_union"))
        )
        .select("doc_a", "doc_b", "n_inter", "n_union")
    )


def _verify_pairs_fanout(
    cand: DataFrame, posting: DataFrame, t_num: int, t_den: int
) -> DataFrame:
    """Exact candidate-only verify, posting-fan-out form: fan cand out
    by doc_a's tokens, keep the tokens doc_b shares, count.  Shuffles
    |cand| x n_set skinny rows, but shares the posting exchanges with
    a posting-derived candidate plan (prefix filter) — see
    `_verify_pairs_arrays` for the measured trade."""
    from zeno_spark.datapipe.partitioning import spread_for_join

    sizes = posting.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_set"))
    pa = posting.select(F.col("doc_id").alias("doc_a"), "token")
    pb = posting.select(F.col("doc_id").alias("doc_b"), "token")
    # spread both fan-out joins: the first's OUTPUT is |cand| x n_set
    # rows from a small candidate input — the same AQE-coalesce blind
    # spot as the pair-generation joins (partitioning.py)
    inter = (
        spread_for_join(cand, "doc_a")
        .join(spread_for_join(pa, "doc_a"), "doc_a")
        .join(spread_for_join(pb, "doc_b", "token"), ["doc_b", "token"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_set").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_set").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_inter"))
        .filter(F.lit(t_den) * F.col("n_inter") >= F.lit(t_num) * F.col("n_union"))
        .select("doc_a", "doc_b", "n_inter", "n_union")
    )


def jaccard_pairs_allpairs(
    docs: DataFrame, text_col: str = "text", t_num: int = 7, t_den: int = 10
) -> DataFrame:
    """Naive all-pairs posting self-join — the small-corpus EXACTNESS
    BASELINE jaccard_pairs' prefix-filtered plan is equality-tested
    against (and the shape the DuckDB oracle runs).  Never the
    production path."""
    posting = _posting(docs, text_col)
    a = posting.alias("a")
    b = posting.alias("b")
    cand = (
        a.join(b, (F.col("a.token") == F.col("b.token"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_pairs_fanout(cand, posting, t_num, t_den)


def jaccard_pairs(
    docs: DataFrame, text_col: str = "text", t_num: int = 7, t_den: int = 10
) -> DataFrame:
    """Pairs (doc_a < doc_b) whose distinct-word Jaccard >= t_num/t_den.
    Output: doc_a, doc_b, n_inter, n_union.

    EXACT prefix-filtered set-similarity join (the All-Pairs/PPJoin
    principle — Bayardo et al. WWW'07, Xiao et al. WWW'08): under any
    global token order, two sets with J >= t must share a token inside
    both their (n - ceil(t*n) + 1)-prefixes, so only prefix postings
    enter the pair-generation join.  Tokens are ordered rarest-first
    (ascending document frequency, token asc tiebreak), which both
    shrinks each prefix's join fan-out and makes prefix tokens the
    low-df ones.  The length filter (t*|x| <= |y| <= |x|/t, integer
    cross-multiplied) prunes inside the join; survivors get the exact
    candidate-only verify.  Identical output to the naive self-join BY
    THEOREM — the DuckDB oracle runs the naive form, so the driver gate
    doubles as the equivalence check (plus the pytest equality test).

    100 TB shape: the quadratic term collapses from sum(df^2) over ALL
    tokens to sum(prefix_df^2) over RARE tokens (~0.3*n per doc at
    t=0.7, each with low df); everything else is linear narrow shuffles
    on token/doc_id.  DF_CAP remains the declared guard for adversarial
    token distributions."""
    cand, posting = _jaccard_candidates(docs, text_col, t_num, t_den)
    return _verify_pairs_fanout(cand, posting, t_num, t_den)


def _jaccard_candidates(
    docs: DataFrame, text_col: str, t_num: int, t_den: int
) -> tuple:
    """Candidate subtree of `jaccard_pairs` (prefix + length + PPJoin
    positional filters, pre-verify) — factored out so evidence scripts
    can count candidate VOLUME directly (scripts/candidate_volume.py);
    returns (candidates, posting)."""
    from pyspark.sql import Window

    posting = _posting(docs, text_col)
    sizes = posting.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_set"))
    tok_df = posting.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("__df").asc(), F.col("token").asc()
    )
    prefix = (
        posting.join(tok_df, "token")
        .join(sizes, "doc_id")
        .withColumn("__pos", F.row_number().over(w))
        .filter(
            F.col("__pos")
            <= F.expr(
                f"n_set - (({t_num} * n_set + {t_den - 1}) DIV {t_den}) + 1"
            )
        )
    )
    # spread_for_join: the prefix posting is small but its self-join
    # output is the quadratic term — keep AQE from coalescing the
    # exchange into a single pair-producing task (partitioning.py;
    # measured at sf0.1: 79s -> 17s for the whole operator)
    from zeno_spark.datapipe.partitioning import spread_for_join

    a = spread_for_join(
        prefix.select(
            F.col("doc_id").alias("doc_a"), "token",
            F.col("n_set").alias("na"), F.col("__pos").alias("pa"),
        ),
        "token",
    )
    b = spread_for_join(
        prefix.select(
            F.col("doc_id").alias("doc_b"), "token",
            F.col("n_set").alias("nb"), F.col("__pos").alias("pb"),
        ),
        "token",
    )
    # PPJoin POSITIONAL filter (Xiao et al. WWW'08 §3.2), on top of the
    # length filter: J >= t forces |x ∩ y| >= ceil(t/(1+t) * (na+nb)),
    # while a match at (1-based) prefix positions (pa, pb) bounds the
    # overlap by 1 + min(na-pa, nb-pb) — matches too deep in either
    # prefix can't reach the required overlap and never become
    # candidates.  Integer form: (1 + min(na-pa, nb-pb)) * (t_num +
    # t_den) >= t_num * (na + nb).  Still a SUPERSET of the true pairs
    # by theorem; the exact verify below is unchanged.
    ubound = F.lit(1) + F.least(
        F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")
    )
    cand = (
        a.join(b, "token")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.lit(t_den) * F.col("na") >= F.lit(t_num) * F.col("nb"))
            & (F.lit(t_den) * F.col("nb") >= F.lit(t_num) * F.col("na"))
            & (
                ubound * F.lit(t_num + t_den)
                >= F.lit(t_num) * (F.col("na") + F.col("nb"))
            )
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return cand, posting


def _posting_sql(table: str) -> str:
    return f"""
      raw AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM {table}),
      df_ok AS (
        SELECT token FROM raw GROUP BY token HAVING count(*) <= {DF_CAP}),
      posting AS (
        SELECT raw.doc_id, raw.token FROM raw JOIN df_ok USING (token)),
      sizes AS (
        SELECT doc_id, count(*) AS n_set FROM posting GROUP BY doc_id)
    """


def jaccard_pairs_sql(table: str = "documents", t_num: int = 7, t_den: int = 10) -> str:
    return f"""
    WITH {_posting_sql(table)},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM posting a JOIN posting b
        ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b, n_inter,
           sa.n_set + sb.n_set - n_inter AS n_union
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE {t_den} * n_inter >= {t_num} * (sa.n_set + sb.n_set - n_inter)
    """


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------

def _thash_array_spark(text_col: str) -> str:
    return (
        f"transform(array_distinct(split({text_col}, ' ')), "
        f"t -> {tokhash_spark('t')})"
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """K minhash values per doc: sig_i = min over distinct tokens of
    (a_i * h(token) + b_i) mod P.  Output: doc_id, s0..s{K-1}."""
    thash = _thash_array_spark(text_col)
    sig_cols = [
        F.expr(
            f"array_min(transform({thash}, h -> ({PERM_A[i]}L * h + {PERM_B[i]}L) % {P}))"
        ).alias(f"s{i}")
        for i in range(MINHASH_K)
    ]
    return docs.select("doc_id", *sig_cols)


def minhash_signatures_sql(table: str = "documents") -> str:
    thash = (
        "list_transform(list_distinct(string_split(text, ' ')), "
        f"t -> {tokhash_sql('t')})"
    )
    sig_cols = ",\n           ".join(
        f"list_min(list_transform({thash}, h -> ({PERM_A[i]} * h + {PERM_B[i]}) % {P})) AS s{i}"
        for i in range(MINHASH_K)
    )
    return f"SELECT doc_id,\n           {sig_cols}\n    FROM {table}"


def minhash_lsh_pairs(
    docs: DataFrame, text_col: str = "text", t_num: int = 7, t_den: int = 10
) -> DataFrame:
    """LSH candidate pairs (band-bucket equi-join over banded signatures)
    verified with an exact Jaccard computed FOR THE CANDIDATES ONLY.

    The verify step routes the posting lists through the candidate pair
    set — two equi-joins whose cost scales with |candidates|, never the
    full all-pairs posting self-join — so LSH genuinely prunes: at 100 TB
    the quadratic jaccard_pairs plan never runs here.  False positives
    are removed by the exact threshold, so the result is identical to
    `cand ∩ jaccard_pairs(docs)` by construction (same tokenization,
    same DF_CAP, same integer threshold).
    Output: doc_a, doc_b, n_inter, n_union."""
    sigs = minhash_signatures(docs, text_col)
    band_keys = F.array(
        *[
            F.concat_ws(
                "|", *[F.col(f"s{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
            )
            for b in range(LSH_BANDS)
        ]
    )
    from zeno_spark.datapipe.partitioning import spread_for_join

    banded = spread_for_join(
        sigs.select("doc_id", F.posexplode(band_keys).alias("band", "key")),
        "band", "key",
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # candidate-only exact verify (shared with jaccard_pairs' prefix
    # filter): cost scales with |candidates|, never all pairs
    return _verify_pairs_arrays(cand, _posting(docs, text_col), t_num, t_den)


def minhash_lsh_pairs_sql(
    table: str = "documents", t_num: int = 7, t_den: int = 10
) -> str:
    band_keys = ", ".join(
        "(" + " || '|' || ".join(
            f"s{b * LSH_ROWS + r}::VARCHAR" for r in range(LSH_ROWS)
        ) + ")"
        for b in range(LSH_BANDS)
    )
    return f"""
    WITH sigs AS ({minhash_signatures_sql(table)}),
    banded AS (
      SELECT doc_id, unnest(generate_series(0, {LSH_BANDS - 1})) AS band,
             unnest([{band_keys}]) AS key
      FROM sigs),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    exact AS ({jaccard_pairs_sql(table, t_num, t_den)})
    SELECT exact.* FROM cand JOIN exact USING (doc_a, doc_b)
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash over distinct-token hashes: bit j is set when the
    sum over tokens of (2*bit_j(h) - 1) is positive.  One groupBy with
    SIMHASH_BITS conditional sums — a single shuffle on doc_id carrying
    8-byte token hashes.  Output: doc_id, simhash (long)."""
    posting = docs.select(
        "doc_id",
        F.explode(
            F.expr(_thash_array_spark(text_col))
        ).alias("h"),
    ).distinct()
    sums = posting.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"(shiftright(h, {j}) & 1) * 2 - 1")).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    acc = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        acc = acc + F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sums.select("doc_id", acc.alias("simhash"))


def simhash_sql(table: str = "documents") -> str:
    thash = (
        "list_transform(list_distinct(string_split(text, ' ')), "
        f"t -> {tokhash_sql('t')})"
    )
    sums = ",\n             ".join(
        f"sum(((h >> {j}) & 1) * 2 - 1) AS b{j}" for j in range(SIMHASH_BITS)
    )
    acc = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH posting AS (
      SELECT DISTINCT doc_id, unnest({thash}) AS h FROM {table}),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM posting GROUP BY doc_id)
    SELECT doc_id, ({acc})::BIGINT AS simhash FROM sums
    """


def simhash_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) <= 3, found via
    the pigeonhole block join: split 32 bits into 4 blocks of 8; any pair
    within hamming 3 must agree on >= 1 whole block, so an equi-join per
    block + union + exact hamming verify finds EVERY qualifying pair with
    no cross join.  Output: doc_a, doc_b, hamming."""
    sh = simhash(docs, text_col)
    block_size = SIMHASH_BITS // SIMHASH_BLOCKS
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"shiftright(simhash, {b * block_size}) & {(1 << block_size) - 1}")
                    for b in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("block", "bkey"),
    )
    from zeno_spark.datapipe.partitioning import spread_for_join

    blocks = spread_for_join(blocks, "block", "bkey")
    a = blocks.alias("a")
    b = blocks.alias("b")
    # exact hamming verify runs INSIDE the join stage, BEFORE the
    # distinct: the de-dup shuffle then carries only true pairs (a pair
    # colliding in k blocks appears k times), not the candidate volume
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


def simhash_pairs_sql(table: str = "documents") -> str:
    # oracle uses the straightforward quadratic form — same result set,
    # different physical plan (that's the point of the check)
    return f"""
    WITH sh AS ({simhash_sql(table)})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """
