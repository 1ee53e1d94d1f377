"""zeno_spark — a PySpark-native rebuild of the capabilities of the
Internet Archive's Zeno web crawler (reference: tomlin7/Zeno, read-only at
/root/reference).

NOT a port: Zeno is a single-process Go daemon (goroutine workers, an
on-disk host-grouped frontier queue, a LevelDB URL-seen store, WARC
sinks).  This package re-expresses the same semantics as a synchronous
round-based (BSP) batch pipeline over snapshot-committed tables:

    read frontier snapshot -> admission gates -> politeness schedule
      -> fetch/parse/expand (vectorized Arrow/pandas UDFs)
      -> dedup (anti-join seen set) -> atomic round commit

Layout
------
schemas        explicit StructTypes for every table (nothing inferred)
session        SparkSession factory (AQE, Arrow, shuffle sizing)
catalog        snapshot-committed parquet tables (local stand-in for Iceberg)
fixtures       deterministic synthetic web corpus (seed=42, zipf hosts)
functions/     URL canonicalization, FNV-1a hashing, image codec (vectorized)
operators/     admission filters, dedup, politeness scheduling, fetch, extract
plans/         the crawl round driver (BSP loop, resume, metrics)
oracle         single-threaded Python re-implementation of the reference
               semantics, used as the golden oracle in tests
"""

__version__ = "0.1.0"
