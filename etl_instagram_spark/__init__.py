"""etl_instagram_spark — a PySpark-native batch + streaming analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL service `garciadiazjaime/etl-instagram` (see SURVEY.md),
re-expressed Spark-first:

- ``sources``   : raw nested-JSON ingestion (from_json with explicit schemas)
                  and parquet table loaders.
- ``operators`` : the relational/merge core — key-based upsert (latest-wins),
                  tombstone delete, anti-join dedup, top-k, dedup family
                  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
                  cosine), embedding similarity search, temporal joins
                  (as-of, bucketized range), hypertable rollup, exponential
                  smoothing, deterministic split/sampling, sequence
                  packing, corpus cleanup (boilerplate lines, repetition
                  signals), graph analytics (integer-quantized PageRank
                  incl. personalized/weighted/redistribute-dangling,
                  degree-ordered triangles, k-core, uniform + weighted
                  deterministic random walks), cross-engine-exact
                  sketches (HLL distincts, count-min frequencies),
                  entity resolution (key blocking with hot-block guard
                  + sorted-neighborhood), PPS weighted sampling, and
                  funnel/cohort analytics.
- ``functions`` : scalar/text kernels — tokenizer, Porter stemmer (pandas
                  UDF), stopwords, language-ID, quality scoring,
                  minhash/simhash, fingerprinting, sentence split.
- ``enrich``    : topics (per-post top-terms + corpus ml.LDA) and the
                  pluggable image-label classifier (mapInPandas + stub).
- ``pipelines`` : the reference's pipelines (hashtag posts, followers,
                  news, rates) as declarative DataFrame lineages.
- ``streaming`` : Structured Streaming incremental mode — foreachBatch
                  upsert with checkpointing, sentinel dead-letter gate +
                  circuit breaker, watermarked windowed aggregates.
- ``multimodal``: binary blob tables with typed metadata; decode /
                  feature-extract plumbing (stubbed pixel work).
- ``plans``     : the analytics query inventory + DuckDB oracle SQL,
                  including the LLM-data-pipeline queries over the
                  documents/embeddings tables.

Everything is DataFrame-declarative so Catalyst handles pushdown, pruning,
join selection and AQE; Python UDFs appear only at genuine boundaries
(stemming, DOM extraction, external classifiers) and are Arrow-vectorized.
"""

__version__ = "0.1.0"
