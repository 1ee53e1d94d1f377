"""Dataflow operators of the crawl pipeline (SURVEY.md §2).

Design rule (SURVEY §4): every admission filter is a native Column
expression, never hidden inside a UDF, so Catalyst pushes it below the
expensive fetch/parse stage and into the parquet scan.
"""
