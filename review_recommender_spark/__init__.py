"""PySpark-native full-text retrieval engine.

A brand-new, Spark-first rebuild of the query semantics of the reference
hybrid lexical+semantic search engine (Ntropy86/review-recommender):
distributed inverted-index build, BM25 top-k with block-max pruning, and a
second-pass hybrid reranking stage — designed for Common-Crawl-scale page
tables, tested locally on synthetic corpora.

Layout:
  config       engine configuration (BM25 params, fusion weights, profiles)
  session      SparkSession factory tuned for local[N] testing
  functions    text normalization chains + tokenizers (reference-frozen)
  oracle       numpy reference oracle (BM25Okapi-semantics + full rescoring)
  index        inverted-index build: postings codec, builder, table IO
  query        BM25 scoring (exact + block-max pruned), second pass, search
  ops          training-data pipeline ops: dedup, similarity, text stats,
               multimodal plumbing
  etl          reference-shaped relational ETL operators (Spark-first)
  streaming    Structured Streaming analogues (windowed aggs, sessionization)
  evalx        IR metrics (nDCG/MRR/Recall/Precision) + golden query set
"""

__version__ = "0.1.0"
