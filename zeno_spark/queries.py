"""Driver-contract queries: every SQL-expressible operator from
SURVEY.md §2, exercised over the driver's testdata tables (TPC-H-ish
star schema + events + documents + embeddings), each with a DuckDB
oracle.

The crawl engine's own tables (frontier/seen/fetched) are job-local, so
the crawl *operator shapes* are expressed here over the driver's tables:

  events.user_id  <->  frontier.host   (the politeness partition key)
  events.ts       <->  enqueue_seq     (FIFO order within the key)
  event rows      <->  frontier items

That keeps the correctness gate on the exact relational shapes the crawl
plan runs (window top-k per key, anti-join dedup, keep-first dedupe,
per-key counters, rolling rates) while the end-to-end crawl semantics
are covered by tests/test_crawl.py's oracle equivalence.

Float discipline: outputs are integers/strings wherever possible;
unavoidable doubles are produced by the SAME expression tree in both
engines (see datapipe modules) so the value-hash compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SCHEDULE_BUDGET = 3   # per-key budget (O2-O4 analogue)
TOPK_USERS = 10

EXCLUDED_USERS = (13, 42, 77)  # F1 analogue constants
ADMIT_TYPES = ("click", "view")
ADMIT_MIN_VALUE = 5.0


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# crawl operator shapes over `events`
# ---------------------------------------------------------------------------

def q_schedule_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2+O3+O4 — per-key FIFO top-budget window: the politeness schedule
    (schedule.py:politeness_schedule) over events keyed by user."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("sched_rank", F.row_number().over(w))
        .filter(F.col("sched_rank") <= SCHEDULE_BUDGET)
        .select("user_id", "event_id", "sched_rank")
    )


def q_schedule_window_sql() -> str:
    return f"""
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC) AS sched_rank
    FROM events
    QUALIFY sched_rank <= {SCHEDULE_BUDGET}
    """


def q_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — the seen-check anti-join shape (dedup.py:anti_join_seen):
    candidate keys (customers) LEFT ANTI JOIN the seen-set (customers
    with an urgent order)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    seen = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return cust.join(seen, "c_custkey", "left_anti")


def q_seen_antijoin_sql() -> str:
    return """
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """


def q_inbatch_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 — keep-first in-batch dedupe (dedup.py:in_batch_dedupe): first
    event per (user, type) by (ts, event_id)."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


def q_inbatch_first_sql() -> str:
    return """
    SELECT user_id, event_type, event_id FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM events)
    WHERE rn = 1
    """


def q_admission_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F5 — native admission predicates (admission.py): type isin +
    value gate + excluded-key anti-filter + substring include."""
    events = _t(spark, sf_dir, "events")
    return events.filter(
        F.col("event_type").isin(*ADMIT_TYPES)
        & (F.col("value") >= ADMIT_MIN_VALUE)
        & ~F.col("user_id").isin(*EXCLUDED_USERS)
        & F.col("props").contains('"k"')
    ).select("event_id", "user_id", "event_type", "value")


def q_admission_filter_sql() -> str:
    types = ", ".join(f"'{t}'" for t in ADMIT_TYPES)
    excl = ", ".join(str(u) for u in EXCLUDED_USERS)
    return f"""
    SELECT event_id, user_id, event_type, value FROM events
    WHERE event_type IN ({types})
      AND value >= {ADMIT_MIN_VALUE}
      AND user_id NOT IN ({excl})
      AND props LIKE '%"k"%'
    """


def q_host_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — per-key counters, conditional aggregation (the metrics
    pivot in plans/crawl.py)."""
    events = _t(spark, sf_dir, "events")
    agg = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_total"), *agg
    )


def q_host_counts_sql() -> str:
    sums = ",\n           ".join(
        f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT AS n_{t}"
        for t in ("click", "view", "purchase", "signup", "error")
    )
    return f"""
    SELECT user_id, count(*) AS n_total,
           {sums}
    FROM events GROUP BY user_id
    """


def q_top_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 top-k — hottest keys (the skew diagnostic feeding the
    salting decision)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(TOPK_USERS)
    )


def q_top_hosts_sql() -> str:
    return f"""
    SELECT user_id, count(*) AS n_events
    FROM events GROUP BY user_id
    ORDER BY n_events DESC, user_id ASC
    LIMIT {TOPK_USERS}
    """


def q_rolling_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — per-round rates with a trailing window (queue/stats.go:49-67
    reshaped to daily event rates + 7-frame rolling mean)."""
    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.avg("n").over(w).alias("avg_7d"),
    )


def q_rolling_rate_sql() -> str:
    return """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('day', ts))
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
           avg(n) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS avg_7d
    FROM daily
    """


# ---------------------------------------------------------------------------
# analytics over the star schema (general query capability + bench heads)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy aggregate with decimal-exact money
    math (doubles cast to decimal before summing so both engines sum
    exactly)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(18,2)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(dec)).cast("double").alias("sum_base"),
            F.sum(
                F.col("l_extendedprice").cast(dec)
                * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
            ).cast("double").alias("sum_disc"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_pricing_summary_sql() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           (sum(l_quantity::DECIMAL(18,2)))::DOUBLE AS sum_qty,
           (sum(l_extendedprice::DECIMAL(18,2)))::DOUBLE AS sum_base,
           (sum(l_extendedprice::DECIMAL(18,2)
                * (1::DECIMAL(3,2) - l_discount::DECIMAL(3,2))))::DOUBLE AS sum_disc,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """


def q_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + aggregate + top-k, decimal-exact.

    No forced broadcast on the customer side: unlike nation/region it
    SCALES with sf (a hint would ship GBs at warehouse scale), so the
    planner's size threshold picks the strategy — broadcast at bench
    sf, shuffle join when the filtered dim outgrows it."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(18,2)"
    rev = (
        F.col("l_extendedprice").cast(dec)
        * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(TOPK_USERS)
        .select("o_orderkey", "revenue")
    )


def q_revenue_topk_sql() -> str:
    return f"""
    SELECT o_orderkey,
           (sum(l_extendedprice::DECIMAL(18,2)
                * (1::DECIMAL(3,2) - l_discount::DECIMAL(3,2))))::DOUBLE AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT {TOPK_USERS}
    """


def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join chain over the dimension tables: suppliers and
    customers per region (nation/region are tiny -> broadcast both)."""
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dim = F.broadcast(
        nation.join(region, F.col("n_regionkey") == F.col("r_regionkey")).select(
            "n_nationkey", "r_name"
        )
    )
    s = (
        supp.join(dim, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    c = (
        cust.join(dim, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return s.join(c, "r_name", "full_outer").na.fill(0)


def q_region_rollup_sql() -> str:
    return """
    WITH dim AS (
      SELECT n_nationkey, r_name FROM nation
      JOIN region ON n_regionkey = r_regionkey),
    s AS (
      SELECT r_name, count(*) AS n_suppliers FROM supplier
      JOIN dim ON s_nationkey = n_nationkey GROUP BY r_name),
    c AS (
      SELECT r_name, count(*) AS n_customers FROM customer
      JOIN dim ON c_nationkey = n_nationkey GROUP BY r_name)
    SELECT r_name,
           coalesce(n_suppliers, 0) AS n_suppliers,
           coalesce(n_customers, 0) AS n_customers
    FROM s FULL OUTER JOIN c USING (r_name)
    """


def q_payload_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 — the crawl sink's payload-revisit dedupe, run as the REAL
    operator (operators/fetch.py:mark_payload_revisits, the WARC
    revisit analogue of crawl/crawl.go:96-99) over the documents table:
    payload digest = sha256 of the UTF-8 text when >= 64 bytes (the
    reference's 1024-byte threshold scaled to this corpus), winner =
    lexicographic keep-first, later identical payloads marked revisit.
    Duplicates are synthesized deterministically (every doc with
    n_chars % 7 == 0 re-emitted under an aliased id) so the revisit
    branch carries real rows."""
    from zeno_spark.operators.fetch import mark_payload_revisits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    dups = docs.filter(F.col("n_chars") % 7 == 0).withColumn(
        "doc_id", F.concat(F.col("doc_id"), F.lit("~dup"))
    )
    ok = docs.unionByName(dups).select(
        F.col("doc_id").alias("url"),
        F.lit(0).cast("long").alias("url_hash"),
        F.lit(0).cast("long").alias("enqueue_seq"),
        F.col("text").cast("binary").alias("bytes"),
    )
    prior = spark.createDataFrame([], "payload_digest string")
    out = mark_payload_revisits(ok, prior, min_size=64)
    return out.select(
        F.col("url").alias("doc_id"), "payload_digest", "revisit"
    )


def q_payload_revisit_sql() -> str:
    return """
    WITH src AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id || '~dup', text FROM documents WHERE n_chars % 7 = 0),
    d AS (
      SELECT doc_id,
             CASE WHEN octet_length(CAST(text AS BLOB)) >= 64
                  THEN sha256(text) END AS payload_digest
      FROM src),
    w AS (
      SELECT payload_digest, min(doc_id) AS winner
      FROM d WHERE payload_digest IS NOT NULL GROUP BY 1)
    SELECT d.doc_id, d.payload_digest,
           coalesce(d.payload_digest IS NOT NULL AND d.doc_id <> w.winner,
                    FALSE) AS revisit
    FROM d LEFT JOIN w USING (payload_digest)
    """


def q_cdx_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 remote tier — the FULL sink dedupe composition, run as the
    REAL operators (mark_payload_revisits THEN mark_cdx_revisits,
    operators/fetch.py — the local->CDX precedence of
    crawl/crawl.go:96-99): local duplicate payloads become in-crawl
    revisits first; remaining ORIGINALS whose digest is archived in a
    prior crawl's CDX index become revisits referring to the archive's
    earliest capture (WARC-Refers-To-Target-URI / -Date).

    The "prior crawl" is synthesized deterministically from the same
    documents table: every doc_id % 3 == 0 payload is archived under
    ``http://archive/<doc_id>`` with a doc_id-derived 14-digit capture
    timestamp — so the round's digest set overlaps the archive exactly
    where the oracle says it should."""
    from zeno_spark.operators.fetch import (
        mark_cdx_revisits,
        mark_payload_revisits,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        "text",
    )
    ok = docs.select(
        F.col("doc_id").alias("url"),
        F.lit(0).cast("long").alias("url_hash"),
        F.lit(0).cast("long").alias("enqueue_seq"),
        F.col("text").cast("binary").alias("bytes"),
    )
    prior = spark.createDataFrame([], "payload_digest string")
    local = mark_payload_revisits(ok, prior, min_size=64)
    two = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    arc = docs.filter(
        (F.col("id") % 3 == 0)
        & (F.octet_length(F.col("text").cast("binary")) >= 64)
    ).select(
        F.concat(
            F.lit("sha256:"), F.sha2(F.col("text").cast("binary"), 256)
        ).alias("digest"),
        F.concat(
            F.lit("2025"), two(F.col("id") % 12 + 1),
            two(F.col("id") % 28 + 1), two(F.col("id") % 24),
            two(F.col("id") % 60), two((F.col("id") * 7) % 60),
        ).alias("ts"),
        F.concat(F.lit("http://archive/"), F.col("doc_id")).alias("url"),
    )
    out = mark_cdx_revisits(local, arc, min_size=64)
    return out.select(
        F.col("url").alias("doc_id"), "revisit",
        "refers_to_url", "refers_to_date",
    )


def q_cdx_revisit_sql() -> str:
    return """
    WITH d AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(doc_id AS BIGINT) AS id,
             CASE WHEN octet_length(CAST(text AS BLOB)) >= 64
                  THEN sha256(text) END AS dg
      FROM documents),
    w AS (
      SELECT dg, min(doc_id) AS winner
      FROM d WHERE dg IS NOT NULL GROUP BY 1),
    loc AS (
      SELECT d.doc_id, d.dg,
             coalesce(d.dg IS NOT NULL AND d.doc_id <> w.winner,
                      FALSE) AS local_rev
      FROM d LEFT JOIN w USING (dg)),
    arc AS (
      SELECT dg,
             '2025' || lpad(CAST(id % 12 + 1 AS VARCHAR), 2, '0')
                    || lpad(CAST(id % 28 + 1 AS VARCHAR), 2, '0')
                    || lpad(CAST(id % 24 AS VARCHAR), 2, '0')
                    || lpad(CAST(id % 60 AS VARCHAR), 2, '0')
                    || lpad(CAST((id * 7) % 60 AS VARCHAR), 2, '0') AS ts,
             'http://archive/' || doc_id AS url
      FROM d WHERE id % 3 = 0 AND dg IS NOT NULL),
    best AS (
      SELECT dg, ts, url FROM (
        SELECT dg, ts, url,
               row_number() OVER (PARTITION BY dg ORDER BY ts, url) AS rn
        FROM arc) WHERE rn = 1)
    SELECT loc.doc_id,
           coalesce(loc.local_rev OR best.url IS NOT NULL, FALSE) AS revisit,
           CASE WHEN NOT loc.local_rev THEN best.url END AS refers_to_url,
           CASE WHEN NOT loc.local_rev AND best.ts IS NOT NULL THEN
                substr(best.ts, 1, 4) || '-' || substr(best.ts, 5, 2) || '-'
                || substr(best.ts, 7, 2) || 'T' || substr(best.ts, 9, 2)
                || ':' || substr(best.ts, 11, 2) || ':'
                || substr(best.ts, 13, 2) || 'Z'
           END AS refers_to_date
    FROM loc LEFT JOIN best USING (dg)
    """


def q_cdx_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 adjunct — wayback-style CAPTURE RESOLUTION (the CDX-server
    lookup a replay stack performs per request), run as the REAL
    operator (cdx.resolve_captures, the one WarcReplayTransport fetches
    through): latest capture per wanted URL, deterministic tiebreak,
    revisit captures stitched to the EARLIEST payload-carrying capture
    of the same digest, unresolvable rows (absent URL, revisit with no
    archived original) dropped.

    The index is synthesized deterministically from documents in the
    ON-DISK CDXJ shape (no record_type column — revisits flagged by the
    public ``warc/revisit`` mime convention, so the driver gate covers
    the shape a .cdxj consumer sees): doc i captures url i%40 at a
    14-digit timestamp monotone in i; every 4th capture is a revisit,
    digests cycle mod 25 with every 17th null (an undeduplicable
    capture), and the wanted set is urls 0..29 — a strict subset, so
    the semi-join prune is load-bearing."""
    from zeno_spark.operators.cdx import MIME_REVISIT, resolve_captures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("id")
    )
    idx = docs.select(
        F.concat(F.lit("http://site/"), (F.col("id") % 40).cast("string"))
        .alias("url"),
        F.lpad(F.col("id").cast("string"), 14, "0").alias("ts"),
        F.when(F.col("id") % 4 == 0, F.lit(MIME_REVISIT))
        .otherwise(F.lit("image/png")).alias("mime"),
        F.when(F.col("id") % 17 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(F.lit("sha256:d"), (F.col("id") % 25).cast("string"))
        ).alias("digest"),
        F.concat(F.lit("w"), (F.col("id") % 7).cast("string"))
        .alias("filename"),
        (F.col("id") * 100).cast("long").alias("offset"),
        F.lit(100).cast("long").alias("length"),
        F.lit(200).cast("int").alias("status"),
    )
    wanted = spark.range(30).select(
        F.concat(F.lit("http://site/"), F.col("id").cast("string"))
        .alias("url")
    )
    return resolve_captures(idx, wanted)


def q_cdx_resolve_sql() -> str:
    return """
    WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
    idx AS (
      SELECT 'http://site/' || CAST(id % 40 AS VARCHAR) AS url,
             lpad(CAST(id AS VARCHAR), 14, '0') AS ts,
             (id % 4 = 0) AS is_rev,
             CASE WHEN id % 17 = 0 THEN NULL
                  ELSE 'sha256:d' || CAST(id % 25 AS VARCHAR) END AS digest,
             'w' || CAST(id % 7 AS VARCHAR) AS filename,
             id * 100 AS "offset", CAST(100 AS BIGINT) AS length,
             CAST(200 AS INTEGER) AS status
      FROM d),
    wanted AS (
      SELECT 'http://site/' || CAST(range AS VARCHAR) AS url
      FROM range(0, 30)),
    best AS (
      SELECT * FROM (
        SELECT idx.*, row_number() OVER (
                 PARTITION BY url
                 ORDER BY ts DESC, filename DESC, "offset" DESC) AS rn
        FROM idx SEMI JOIN wanted USING (url))
      WHERE rn = 1),
    orig AS (
      SELECT digest, filename AS o_file, "offset" AS o_off,
             length AS o_len
      FROM (
        SELECT digest, filename, "offset", length, row_number() OVER (
                 PARTITION BY digest
                 ORDER BY ts, filename, "offset") AS rn
        FROM idx WHERE NOT is_rev AND digest IS NOT NULL)
      WHERE rn = 1)
    SELECT url, ts, status,
           filename AS hdr_filename, "offset" AS hdr_offset,
           length AS hdr_length,
           CASE WHEN is_rev THEN o_file ELSE filename END AS pay_filename,
           CASE WHEN is_rev THEN o_off ELSE "offset" END AS pay_offset,
           CASE WHEN is_rev THEN o_len ELSE length END AS pay_length
    FROM best LEFT JOIN orig USING (digest)
    WHERE (CASE WHEN is_rev THEN o_file ELSE filename END) IS NOT NULL
    """


def q_aimd_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-O5 addition — the ADAPTIVE-POLITENESS control law
    (streaming/politeness.py), run as the REAL batch-replay operator
    (replay_budgets, applyInPandas — the audit form of the
    applyInPandasWithState streaming controller) over a per-(host,
    round) metrics table derived from `events`:

      host        <-> user_id            round    <-> event_id % 4
      scheduled    =  rows in the group
      fetched_err  =  'error' rows       (non-200 analogue)
      redirects    =  'error' rows with value >= 4     (3xx analogue)
      retries      =  'error' rows with 2 <= value < 4 (429 analogue)

    The fold is RECURSIVE per host (round r's budget depends on round
    r-1's), so the oracle is a recursive CTE applying the identical
    transition.  Float discipline: ewma_err is computed by the same
    binary64 expression sequence in both engines (same constants, same
    op order), so the value-hash compare is exact — verified bit-equal.
    Threshold choice exercises all three branches at sf0.01 (147
    halved / 412 raised / 41 held of 600 rows)."""
    from zeno_spark.streaming.politeness import replay_budgets

    events = _t(spark, sf_dir, "events")
    err = F.col("event_type") == "error"
    metrics = events.groupBy(
        F.col("user_id").cast("string").alias("host"),
        (F.col("event_id") % 4).cast("int").alias("round"),
    ).agg(
        F.count("*").cast("int").alias("scheduled"),
        F.sum(F.when(err, 1).otherwise(0)).cast("int").alias("fetched_err"),
        F.sum(F.when(err & (F.col("value") >= 4.0), 1).otherwise(0))
        .cast("int").alias("redirects"),
        F.sum(
            F.when(err & (F.col("value") >= 2.0) & (F.col("value") < 4.0), 1)
            .otherwise(0)
        ).cast("int").alias("retries"),
    )
    return replay_budgets(metrics)


def q_aimd_budgets_sql() -> str:
    return """
    WITH RECURSIVE metrics AS (
      SELECT CAST(user_id AS VARCHAR) AS host,
             CAST(event_id % 4 AS INT) AS round,
             CAST(COUNT(*) AS INT) AS scheduled,
             CAST(SUM(CASE WHEN event_type = 'error'
                           THEN 1 ELSE 0 END) AS INT) AS fetched_err,
             CAST(SUM(CASE WHEN event_type = 'error' AND value >= 4.0
                           THEN 1 ELSE 0 END) AS INT) AS redirects,
             CAST(SUM(CASE WHEN event_type = 'error'
                            AND value >= 2.0 AND value < 4.0
                           THEN 1 ELSE 0 END) AS INT) AS retries
      FROM events GROUP BY 1, 2),
    ord AS (
      SELECT *,
             CAST(row_number() OVER (PARTITION BY host
                                     ORDER BY round) AS INT) AS rn,
             GREATEST(0, fetched_err - redirects - retries) AS hard_err,
             CAST(GREATEST(0, fetched_err - redirects - retries) + retries
                  AS DOUBLE) / CAST(scheduled AS DOUBLE) AS err_rate
      FROM metrics),
    fold AS (
      SELECT host, CAST(NULL AS INT) AS round, 0 AS rn,
             16 AS budget, CAST(0.0 AS DOUBLE) AS ewma_err
      FROM (SELECT DISTINCT host FROM ord)
      UNION ALL
      SELECT host, round, rn,
             CASE WHEN retries > 0
                    THEN GREATEST(1, CAST(floor(budget0 / 2.0) AS INT))
                  WHEN hard_err = 0 AND ewma1 < 0.1
                    THEN LEAST(256, budget0 + 4)
                  ELSE budget0 END AS budget,
             ewma1 AS ewma_err
      FROM (SELECT o.host, o.round, o.rn, f.budget AS budget0,
                   o.hard_err, o.retries,
                   (1.0 - 0.3) * f.ewma_err + 0.3 * o.err_rate AS ewma1
            FROM fold f
            JOIN ord o ON o.host = f.host AND o.rn = f.rn + 1) s)
    SELECT host, round, budget, ewma_err FROM fold WHERE rn >= 1
    """


# ---------------------------------------------------------------------------
# host link-graph analytics (datapipe/graph.py)
# ---------------------------------------------------------------------------
# The crawl's own link graph (frontier parent_host -> host edges,
# graph.host_link_edges) is job-local, so the gate exercises the graph
# operators over a discovery-shaped edge list from the star schema:
# customer -> supplier edges through orders/lineitem (who discovered
# whom), supplier node ids offset into a disjoint range exactly like
# two hosts sharing an id space never could collide.

_LINKGRAPH_EDGES_SQL = """
SELECT CAST(o_custkey AS BIGINT) AS src,
       CAST(l_suppkey + 1000000 AS BIGINT) AS dst
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
"""


def _linkgraph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey") + F.lit(1000000)).cast("long").alias("dst"),
        )
    )


def q_host_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph degrees (graph.degrees) — exact bigint in/out degree
    per node over the distinct discovery edges."""
    from zeno_spark.datapipe import graph as gr

    return gr.degrees(_linkgraph_edges(spark, sf_dir))


def q_host_degrees_sql() -> str:
    from zeno_spark.datapipe import graph as gr

    return gr.degrees_sql(_LINKGRAPH_EDGES_SQL)


def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank (graph.pagerank, K=5 iterations)
    over the discovery edge list — hash-exact by the integer-arithmetic
    determinism discipline (graph.py module docstring)."""
    from zeno_spark.datapipe import graph as gr

    return gr.pagerank(_linkgraph_edges(spark, sf_dir))


def q_host_pagerank_sql() -> str:
    from zeno_spark.datapipe import graph as gr

    return gr.pagerank_sql(_LINKGRAPH_EDGES_SQL)
