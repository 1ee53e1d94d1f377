"""Explicit StructTypes for every table the engine touches.

The reference declares all schemas in code (protobuf for queue items,
``/root/reference/internal/pkg/queue/protobuf/v1/item.proto:6-17``; Go
structs elsewhere) and never infers anything.  We keep that discipline:
every read/write goes through one of these constants.

Table <-> reference mapping:

  FRONTIER  <-> queue.Item            (queue/queue.go:49-59)
  SEEN      <-> seencheck LevelDB     (seencheck/seencheck.go:13-16,50-62)
  FETCHED   <-> WARC response records (crawl/crawl.go:101-119) reshaped to
                the image+caption row of BASELINE.json input_hint
  PAGES     <-> "the web" (what HTTP GET would return) — synthetic corpus
  LINKS     <-> extractor outputs     (outlinks.go:13-51, assets.go:182-457)
  ROBOTS    <-> north-rule addition (absent in the reference; SURVEY §2.2 F10)
  METRICS   <-> queue/crawl counters  (queue/stats.go:9-23, crawl/config.go:90-93)
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# frontier — one row per queue.Item (queue/queue.go:49-59)
# ---------------------------------------------------------------------------
FRONTIER = T.StructType(
    [
        T.StructField("id", T.StringType(), False),          # Item.ID (item.go:21-23)
        T.StructField("url", T.StringType(), False),         # Item.URL (canonical)
        T.StructField("url_hash", T.LongType(), False),      # Item.Hash = FNV-1a64 (item.go:18-19)
        T.StructField("host", T.StringType(), False),        # index key (enqueue.go:203)
        T.StructField("parent_url", T.StringType(), True),   # Item.ParentURL
        T.StructField("hop", T.IntegerType(), False),        # Item.Hop
        T.StructField("type", T.StringType(), False),        # "seed" | "asset" | "redirect"
        T.StructField("bypass_seencheck", T.BooleanType(), False),  # capture.go:322
        T.StructField("redirect", T.IntegerType(), False),   # redirect-chain depth (capture.go:165)
        T.StructField("retry", T.IntegerType(), False),      # 429 retry count (capture.go:56-117)
        T.StructField("enqueue_seq", T.LongType(), False),   # deterministic FIFO tiebreak
        T.StructField("discovered_round", T.IntegerType(), False),
        T.StructField("not_before_round", T.IntegerType(), False),  # retry backoff
        T.StructField("priority", T.IntegerType(), False),   # politeness PRIORITY queue
        # tier (north rule): higher pops first within a host; ties fall
        # back to the fifo/lifo strategy order.  No reference analogue
        # (Zeno's queue is strictly host-round-robin+FIFO); 0 = neutral.
    ]
)

# ---------------------------------------------------------------------------
# seen — the URL-seen set (seencheck/seencheck.go:50-62)
# ---------------------------------------------------------------------------
SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),   # kept for hash-collision exactness
        T.StructField("type", T.StringType(), False),  # stored value in the reference
        T.StructField("round", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# bloom — the D9 prefilter's PERSISTED per-bucket state (incremental
# maintenance: each round ORs only the newly-seen hashes in, instead of
# rebuilding from the full seen table — operators/dedup.py
# merge_bloom_index).  No reference analogue (the reference has no
# bloom anywhere); rollback-consistent with `seen` via the round
# marker, which is what keeps the no-false-negative discipline across
# crash recovery.
# ---------------------------------------------------------------------------
BLOOM = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("m_bits", T.LongType(), False),
        T.StructField("k", T.IntegerType(), False),
        T.StructField("overflow", T.BooleanType(), False),
        T.StructField("bits", T.BinaryType(), False),
        T.StructField("n_keys", T.LongType(), False),
        # the bucket count the index was built under: probe/merge refuse
        # a mismatched routing (silent false negatives) instead of
        # trusting four call sites to agree by convention
        T.StructField("n_buckets", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# claimed — frontier rows consumed by a round (stand-in for Iceberg row
# deletes; compacted periodically).  Not present in the reference — its
# queue pops destructively (queue/dequeue.go:73-132).
# ---------------------------------------------------------------------------
CLAIMED = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# pages — the synthetic web corpus (image+caption pages per BASELINE.json
# input_hint).  `status`/`redirect_to` exercise capture.go:84-178.
# ---------------------------------------------------------------------------
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),        # png | jpeg(stub codec)
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("content_type", T.StringType(), False),  # routing, capture.go:459-501
        T.StructField("status", T.IntegerType(), False),
        T.StructField("redirect_to", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# links — synthetic link graph = what the HTML/XML/JSON extractors would
# return (outlinks.go:13-51, assets.go:182-457); dst_url may be relative
# and may carry fragments (exercises utils/url.go:78-94).
# ---------------------------------------------------------------------------
LINKS = T.StructType(
    [
        T.StructField("src_url", T.StringType(), False),
        T.StructField("dst_url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # outlink | asset
        T.StructField("tag", T.StringType(), False),   # a | img | script | ...
    ]
)

# ---------------------------------------------------------------------------
# fetched — the WARC-replacement sink (input_hint row shape)
# ---------------------------------------------------------------------------
FETCHED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("type", T.StringType(), False),   # seed | asset | redirect
        T.StructField("hop", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
        # D8 payload dedupe (crawl/crawl.go:96-99): sha256 of the payload
        # when size >= threshold; revisit rows keep metadata + digest but
        # carry no bytes (the WARC revisit-record analogue)
        T.StructField("payload_digest", T.StringType(), True),
        T.StructField("revisit", T.BooleanType(), False),
        # D8 remote tier — CDX-server dedupe (crawl/crawl.go:97-98):
        # a revisit that dedupes against a PRIOR crawl's archive refers
        # to the original capture there (WARC-Refers-To-Target-URI /
        # WARC-Refers-To-Date on the exported revisit record); null for
        # in-crawl revisits and originals
        T.StructField("refers_to_url", T.StringType(), True),
        T.StructField("refers_to_date", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# metadata — S7 side-record sink: the WARC "metadata" record analogue
# (capture.go:386-389 writes yt-dlp's raw JSON as a metadata record with
# content-type "application/json; metadata-type=ia-video"); any
# site-specific capture can append side records here keyed to the
# triggering url + round, committed under the same round marker
# ---------------------------------------------------------------------------
METADATA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("record_type", T.StringType(), False),  # e.g. "metadata"
        T.StructField("content_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# robots — north-rule addition (reference has none; grep robots -> 0 hits)
# ---------------------------------------------------------------------------
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
        # Sitemap: directives (sitemaps.org cross-group lines) recorded
        # at fetch time; the live tier turns them into seed candidates
        # exactly once per newly covered host (plans/crawl.py
        # _refresh_robots -> operators/robots.robots_sitemap_candidates)
        T.StructField("sitemaps", T.ArrayType(T.StringType()), True),
    ]
)

# ---------------------------------------------------------------------------
# metrics — per-round per-host lineage + counters (queue/stats.go:9-23,
# crawl/config.go:90-93 reshaped to one append per round)
# ---------------------------------------------------------------------------
METRICS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("fetched_ok", T.LongType(), False),
        T.StructField("fetched_err", T.LongType(), False),
        T.StructField("redirects", T.LongType(), False),
        T.StructField("retries", T.LongType(), False),
        T.StructField("discovered", T.LongType(), False),
        T.StructField("new_after_dedup", T.LongType(), False),
        # byte lineage (crawl/stats.go:59-63: warc.DataTotal /
        # LocalDedupeTotal): octets sunk this round vs octets the D8
        # revisit marking saved — measured from the narrow
        # payload_size column, never by re-scanning binary payloads
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("deduped_bytes", T.LongType(), False),
    ]
)

# budgets — adaptive-politeness state (streaming/politeness.py control
# law, folded incrementally per round by the crawl driver): one row per
# host ever observed, the recommendation the NEXT round's politeness
# window grants it.  Derivable from the metrics lineage (replay_budgets),
# so the table is pure acceleration state like BLOOM — rollback restores
# it with the round marker and a re-run refolds deterministically.
BUDGETS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("budget", T.IntegerType(), False),
        T.StructField("ewma_err", T.DoubleType(), False),
        T.StructField("last_round", T.IntegerType(), False),
    ]
)

# hostrank — link-rank frontier-prioritization state (plans/crawl.py
# _update_hostrank): fixed-point PageRank (datapipe/graph.py) over the
# frontier's host discovery edges, recomputed every
# cfg.rank_priority_every rounds and truncated to the top
# cfg.rank_priority_top hosts; newly discovered rows on these hosts
# enter the frontier at priority >= 1 so the politeness window pops
# them first (the north rule's priority queue, fed by link analysis).
# Acceleration state like BLOOM/BUDGETS: derivable from the frontier
# table, rollback-consistent via the round marker.
HOSTRANK = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("rank_micro", T.LongType(), False),
    ]
)

# hostedges — persisted host-level discovery-edge state (the incremental
# fold feeding _update_hostrank; r4 verdict #7).  One row per
# (src_host, dst_host) PER FOLD — duplicates across folds are fine (the
# rank walk distincts; compaction sums weights), what matters is that a
# rank refresh reads THIS table, never a full frontier scan.
HOSTEDGES = T.StructType(
    [
        T.StructField("src_host", T.StringType(), False),
        T.StructField("dst_host", T.StringType(), False),
        T.StructField("weight", T.LongType(), False),
    ]
)

# seeds — URL-per-line seed list (queue/item.go:53-102)
SEEDS = T.StructType([T.StructField("url", T.StringType(), False)])
