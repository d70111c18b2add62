"""Compatibility facade for the LLM-data-pipeline gate queries.

The query bodies moved to per-family modules in r14 (r13 VERDICT task
#5 — this file had grown to ~3,900 lines) with ZERO behavior change:

- :mod:`q_shared` — token/whitespace SQL mirrors, language detector,
  small-file spread, vector helpers, the convergence-asserted CC CTE
  chain shared by the dedup and entity oracles;
- :mod:`q_docs` — text analysis + dedup/near-dup/BM25/heavy hitters;
- :mod:`q_docs_pipeline` — splits, mixtures, cleanup, packing, PII,
  decontamination, chunking, leakage-safe splitting;
- :mod:`q_emb` — kNN / LSH / IVF / PQ ANN, semantic dedup, cross-modal,
  certified iterative k-means;
- :mod:`q_relational` — order/nation/part analytics and SQL shapes;
- :mod:`q_graph` — PageRank + entity resolution;
- :mod:`q_events` — percentiles, session windows, CM frequency, the
  funnel, and dyadic-CM quantiles.

Importing THIS module imports every family module, so the
``@query``/``oracle`` registrations fire exactly as before, and every
name historically referenced as ``llm_queries.<name>`` (tests, bench,
plans/parity_extras.py) keeps resolving — the star imports cover the
public surface and the explicit imports below cover the private names
the EXTRAS registry and test suite reach for.

See each family module's docstring for the reference lineage and the
100-TB scale notes that used to live here.
"""

from __future__ import annotations

from etl_instagram_spark.plans.oracle import (  # noqa: F401
    oracle,
    sql_revenue_dec,
)
from etl_instagram_spark.plans.queries import _t, query  # noqa: F401

from etl_instagram_spark.plans.q_shared import (  # noqa: F401
    SQL_TOKS,
    SQL_WS,
    _CC_ORACLE_ROUNDS,
    _as_double,
    _dot,
    _spread,
    _sql_cc_rounds,
    _sql_detect_language,
    _sql_marker_hits,
)
from etl_instagram_spark.plans.q_docs import *  # noqa: F401,F403
from etl_instagram_spark.plans.q_docs import (  # noqa: F401
    _BM25_TERMS,
    _BPE_MAX_WORDS,
    _BPE_N_MERGES,
    _SQL_QUALITY,
    _bpe_fit_word_map,
    _sql_band_hashes,
    _sql_bm25_topk,
    _sql_minhash_bands,
    _sql_minhash_sig,
    _sql_simhash32,
    _sql_stop_drop_predicate,
    _sql_verified_pairs,
)
from etl_instagram_spark.plans.q_emb import *  # noqa: F401,F403
from etl_instagram_spark.plans.q_emb import (  # noqa: F401
    _bucket_col,
    _fit_oracle_centroids,
    _ivf_oracle_sql,
    _recall_pairs,
    _sql_ann_lsh_topk,
    _sql_bucket,
)
from etl_instagram_spark.plans.q_relational import *  # noqa: F401,F403
from etl_instagram_spark.plans.q_docs_pipeline import *  # noqa: F401,F403
from etl_instagram_spark.plans.q_docs_pipeline import (  # noqa: F401
    _PACK_SHARDS,
    _sql_pack_shard,
)
from etl_instagram_spark.plans.q_graph import *  # noqa: F401,F403
from etl_instagram_spark.plans.q_events import *  # noqa: F401,F403
