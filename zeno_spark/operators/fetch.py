"""Fetch stage, X1-X5 (SURVEY §2.5).

The reference's executeGET (capture.go:30-181) does: build request with
Referer from the parent (capture.go:206-210), GET through the
WARC-recording client, retry on error, linear-backoff on 429
(capture.go:84-114), follow 3xx up to MaxRedirect (capture.go:120-178).

Batch shape: the scheduled rows are host-partitioned and run through an
``applyInPandas`` *fetch worker* — one Arrow batch per host group, which
is where a real deployment performs the (async) HTTP calls for that
host under its politeness budget.  In this sandbox there is no network:
the "origin server" is the deterministic ``pages`` table, so the worker
receives the page payload pre-joined (an equi-join on canonical url IS
the sandbox's HTTP) and applies the response-status semantics:

  * missing page        -> status 404 (connection-refused analogue)
  * 429 + retry >= 1    -> 200 (deterministic "server recovered", so the
                           retry path is exercised end-to-end)
  * 301 w/ redirect_to  -> emits a redirect continuation row (X2):
                           same item id, same hop, redirect+1, target
                           seenchecked next round (D5), bounded by F7
  * 200                 -> a `fetched` row (image payload + caption for
                           image/* pages; html rows go on to extract)

Assets (X3) need no special casing here: an asset is just a frontier row
with type='asset' and hop=parent.hop (assets.go:109), so the fan-out is
the normal expansion path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zeno_spark import schemas

# scheduled-frontier columns carried through fetch
_CARRY = [f.name for f in schemas.FRONTIER.fields]
_PAGE_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
              "content_type", "redirect_to"]

FETCH_RESULT = T.StructType(
    schemas.FRONTIER.fields
    + [
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("redirect_to", T.StringType(), True),
        T.StructField("status", T.IntegerType(), False),  # effective status
    ]
)


def _verify_payloads(out: pd.DataFrame) -> None:
    """Decode every fetched image payload and recompute its perceptual
    hash — the WARC payload-digest step of the reference's sink
    (crawl/crawl.go:96-99) applied to the image corpus: a fetch isn't
    'ok' until its payload decodes and its digest matches the metadata.
    Mutates `out` in place: phash is overwritten with the recomputed
    value; undecodable payloads get status 422."""
    from zeno_spark.functions.images import decode_image, phash64

    mask = (out["status"] == 200) & out["bytes"].notna() & out["fmt"].notna()
    for i in out.index[mask]:
        try:
            px = decode_image(bytes(out.at[i, "bytes"]), out.at[i, "fmt"])
            out.at[i, "phash"] = phash64(px)
        except Exception:
            out.at[i, "status"] = 422  # fetched but payload invalid


def _effective_status(pdf: pd.DataFrame) -> pd.Series:
    raw = pdf["__page_status"]
    status = raw.fillna(404).astype("int64")  # missing page = 404 analogue
    recovered = (status == 429) & (pdf["retry"] >= 1)
    status[recovered] = 200
    return status.astype("int32")


def fetch(scheduled: DataFrame, pages: DataFrame) -> DataFrame:
    """Host-partitioned fetch worker.  Input: this round's scheduled
    frontier rows.  Output: FETCH_RESULT rows (one per scheduled row).

    The join keys the big `pages` side by canonical url; Catalyst prunes
    page columns to the nine we carry and (with AQE) picks SMJ/shuffled
    hash by size.  The subsequent groupBy("host") is the politeness unit:
    one Arrow batch per host = one worker's fetch queue.
    """
    page_side = pages.select(
        F.col("url").alias("__page_url"),
        F.col("status").alias("__page_status"),
        *_PAGE_COLS,
    )
    joined = scheduled.join(
        page_side, scheduled["url"] == page_side["__page_url"], "left"
    ).drop("__page_url")

    def _worker(pdf: pd.DataFrame) -> pd.DataFrame:
        # A real deployment issues rate-limited async HTTP here, honoring
        # crawl_delay for the host; the response fields below would come
        # off the wire instead of the pre-joined page columns.
        out = pdf[_CARRY + _PAGE_COLS].copy()
        out["status"] = _effective_status(pdf)
        # nullable dtypes so Arrow maps NA -> null (not NaN-in-int errors)
        out["w"] = out["w"].astype("Int32")
        out["h"] = out["h"].astype("Int32")
        out["phash"] = out["phash"].astype("Int64")
        # non-200 responses carry no payload (the WARC client still logs
        # them; our fetched table keeps the status row with null payload)
        failed = out["status"] != 200
        for c in ("image_id", "bytes", "caption", "fmt"):
            out.loc[failed, c] = None
        out.loc[failed, ["w", "h", "phash"]] = pd.NA
        # a 200 never re-redirects; keep redirect_to only on 3xx rows
        out.loc[~out["status"].between(300, 399), "redirect_to"] = None
        _verify_payloads(out)
        return out

    return joined.groupBy("host").applyInPandas(_worker, schema=FETCH_RESULT)


def split_results(results: DataFrame):
    """(ok, redirects, failed_429, dead) — native filters over one pass."""
    ok = results.filter(F.col("status") == 200)
    redirects = results.filter(
        F.col("status").between(300, 399) & F.col("redirect_to").isNotNull()
    )
    failed_429 = results.filter(F.col("status") == 429)
    dead = results.filter(
        (~F.col("status").isin(200, 429))
        & ~(F.col("status").between(300, 399) & F.col("redirect_to").isNotNull())
    )
    return ok, redirects, failed_429, dead


def to_fetched_rows(ok: DataFrame, round_no: int) -> DataFrame:
    """Project fetch successes into the `fetched` sink schema (the WARC
    replacement, SURVEY §2.1 S6)."""
    return ok.select(
        "url", "url_hash", "host", "image_id", "bytes", "w", "h", "fmt",
        "caption", "phash", "status", "type", "hop",
        F.lit(round_no).cast("int").alias("round"),
    )
