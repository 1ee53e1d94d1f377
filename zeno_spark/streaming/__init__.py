"""Structured Streaming surfaces over the crawl's snapshot tables."""
