"""Large-scale training-data operations over document/embedding tables.

Not part of the reference (hydra crawls metadata); these are the ops a
100 TB web-text pipeline needs downstream of the crawl: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search, text analysis (language-ID, quality, tokens,
fingerprints), multimodal column plumbing.

Design rule as everywhere: built-in column expressions first (JVM,
whole-stage codegen); Arrow-batched pandas UDFs only where numpy math
(bit voting, matrix projections) beats expression trees.
"""

from hydra_spark.ml import dedup, similarity, text  # noqa: F401
