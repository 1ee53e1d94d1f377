"""Training-data pipeline operators over the crawl corpus.

A crawl engine's output (documents, captions, image payloads, embedding
columns) feeds large-scale training-data pipelines; these modules add the
operations such a pipeline needs, all expressed Spark-first (native
columns / JVM codegen for everything hashable, Arrow-batched pandas UDFs
only where binary payloads force Python):

  text.py        token counting, quality scoring, language-ID,
                 document fingerprinting
  dedup.py       exact (hash-groupBy), n-gram Jaccard, MinHash+LSH,
                 SimHash near-dup
  similarity.py  embedding cosine top-k (brute force) + LSH-bucketed ANN
  multimodal.py  binary image/audio/video column plumbing (decode /
                 feature-extract / resize as Arrow-batched UDFs)

Every SQL-expressible operator ships with a DuckDB oracle string built
from the SAME constants (hash moduli, permutation seeds, thresholds), so
the driver's side-by-side check exercises real semantic parity.
"""
