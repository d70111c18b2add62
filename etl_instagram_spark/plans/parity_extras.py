"""Rotated-out gate queries, kept under pytest DuckDB parity.

The driver's CORRECTNESS file caps at 50 rows, so promoting new operator
families into the gate forces rotation. Rotation must not silently drop
operator-surface coverage: every query rotated OUT of the 50-row gate
moves HERE as a (spark_fn, oracle_sql) pair, and
tests/test_rotated_parity.py runs each pair against DuckDB with the same
value-and-type comparison the driver applies — the gate shrinks, the
regression surface does not.

Current entries:
- ``pivot_returnflag_status`` (r6 rotation; conditional-agg pivot —
  grouping sets stay gated via events_hypertable_rollup since the
  second r15 rotation moved cube_returnflag_status here too)
- ``top10_customers_by_revenue`` (r6; join+agg+global top-k — the same
  TakeOrderedAndProject shape stays gated via q3_unshipped_revenue)
- ``orders_date_functions`` (r6; date-part extraction — date arithmetic
  stays gated via order_gap_days / customer_rolling_30d_revenue)
- ``docs_top_terms_per_doc`` (r6; per-doc top-terms kernel — the same
  stemmer/stopword/top-k path stays gated via docs_top_terms_by_lang)
- ``segment_rollup`` / ``customer_running_revenue`` (re-created: the r5
  rotation dropped the gate's only ROLLUP/grouping-sets and cumulative
  window-frame coverage with no replacement — these restore both
  surfaces at pytest level)
- ``customers_without_urgent_orders`` (r6; NOT-EXISTS anti-join — the
  semi-join sibling stays gated via q4_order_priority_semijoin)
- ``docs_minhash_bands`` (r6; banding audit — signature/band machinery
  stays gated end-to-end via docs_near_dedup_summary)
- ``events_sessionization`` (r6; lag-gap batch sessionization — the
  NATIVE session_window stays gated via events_session_window_native)
- ``emb_ann_lsh_topk`` (r6; single-query bucket top-k — the bucket path
  stays gated via emb_ann_recall and emb_knn_join_recall)
- ``emb_knn_cosine`` (r6, for emb_semantic_dedup; exact-cosine stays
  gated via the recall queries' ground-truth sides)
- ``supplier_geo_bands`` (r6, for docs_domain_cap; haversine keeps
  pytest coverage in functions/geo.py)
- ``q6_forecast_revenue`` (r6, for docs_gopher_filter; filter+global-agg
  stays gated via q1_pricing_summary / conditional_agg_promo_share)
- ``part_url_parse`` (r6, for docs_bm25_topk; the parse_url surface
  keeps projection pytest coverage)
- ``conditional_agg_promo_share`` (r6, for emb_pq_recall;
  CASE-WHEN-in-aggregate stays gated via docs_gopher_filter)
- ``docs_quality_bands`` (r6, for docs_bpe_tokens; quality scoring
  stays gated via docs_gopher_filter's nine-rule profile)
- ``docs_unigram_ppl`` (never gated — the CCNet perplexity signal,
  value-checked against a model-literal SQL mirror like the gate's
  fit-from-data oracles)

Never-gated entries (EXTRAS has no row cap, so surfaces that would
displace gate diversity get driver-grade value+type parity here):
``docs_hybrid_rrf`` (BM25 ⊕ cosine fusion), ``docs_unigram_ppl`` /
``docs_bigram_ppl`` (LM perplexity, uni + stupid-backoff bigram),
``docs_bpe_pack`` (tokenizer-fit → learned-token counts → budget
packing, end to end), ``orders_profile`` (one-scan column profiler),
``orders_above_customer_avg`` (correlated scalar subquery),
``customer_rank_distributions`` (percent_rank / cume_dist),
``events_gapfill`` (LOCF + linear time-bucket gap filling),
``events_anomalies`` (rolling z-score profile).

r8 rotation: ``order_gap_days`` (LAG offset window) moved here to gate
the distributed-k-means query ``emb_kmeans_cells`` (plans/llm_queries.py
— sample init + full-data Lloyd's refinement + per-cell cost, init and
every iteration replayed through DuckDB).

r10 rotations: ``top3_orders_per_customer`` (row_number top-k; shape
stays gated via docs_bm25_topk),
``nation_customer_listagg`` (listagg), ``part_metrics_unpivot``
(unpivot/Expand) — seats given to the integer-quantized PageRank
(``graph_pagerank_suppliers``), near-dup cluster representatives
(``docs_dup_cluster_reps``, the first cross-engine-certified
connected-components row), and the content-keyed leakage-safe split
(``docs_leakage_safe_split``).

r15 rotation: ``sql_brand_revenue`` (the spark.sql() front-door face —
the SAME shared ANSI string still runs on both engines here, and its
broadcast plan pin stays in test_plan_invariants.py) — seat given to
the KMV set-overlap sketch face (``docs_kmv_shingle_overlap``, the
last of the five sketch families to graduate; its sibling
``docs_kmv_sample`` stays an EXTRAS row). Second r15 rotation (the runway executed same-round):
``cube_returnflag_status`` (CUBE grouping sets — the machinery stays
gated via events_hypertable_rollup, and the exact query keeps value
parity here) — seat given to ``docs_bm25_indexed``, the inverted-index
BM25 face whose pushed-term-filter plan shape now has driver
certification; its oracle is the scan path's own SQL replay, so one
cross-engine statement certifies both faces agree.

r16 rotation: ``docs_domain_cap`` (per-source frequency cap — the
hashed-rank cap machinery stays gated via docs_hash_split_sample's
shared bucket_sql kernel and docs_corpus_mixture, and the exact query
keeps value parity in plans/extras_docs.py) — seat given to
``graph_walk_embeddings`` (plans/q_graph.py): the graph family's
composed product — walks → skip-gram co-occurrence → PPMI → ±1
random-projection embeddings over the 1997Q1 customer↔supplier
subgraph, every emitted embedding FLOAT replayed in one DuckDB
statement. The subgraph bound is the part_entity_resolution precedent
(bound the work, keep every operator live); pre-measured at sf0.1
(~3.8 s warm after pinning random_walks' distinct edge list, which cut
the chain ~35% for every walk consumer). Next runway candidate (r17):
``docs_weighted_sample`` — Duffield-Lund-Thorup priority sampling with
a live threshold branch in all five langs, ids/hashes/est floats
bit-for-bit (plans/extras_docs.py); its estimator semantics are the
strongest not-yet-certified value contract in the sampling family.
Seat template: a sub-second relational row whose machinery stays gated
elsewhere (orders_set_ops' four legs make orders_shipments_in_window's
interval-join the likely candidate only if a dedicated range-join row
replaces it — otherwise pick from the window family, where
customer_rolling_30d_revenue's range frame duplicates
events_hypertable_rollup's time-bucket machinery least).
docs_weighted_sample pre-measured at sf0.1 per the rotation charter:
1.4-2.2 s warm on a degraded r16 container (240 rows, threshold branch
live in all five langs) — no KMV-style staging fix needed before the
seat lands.

r17 rotation: ``customer_rolling_30d_revenue`` (RANGE-frame rolling
window — the value-based-frame machinery stays gated via
events_hypertable_rollup's time buckets and events_asof_join's ordered
merge, and the exact query keeps value parity in
plans/extras_relational.py) — seat given to ``docs_weighted_sample``
(plans/q_docs.py), the Duffield-Lund-Thorup priority-sampling estimator
whose subset-sum semantics were the sampling family's strongest
not-yet-certified value contract. Pre-promotion checks per the r16
verdict: re-measured 0.13 s warm at sf0.1 on a quiet container (vs the
1.4-2.2 s degraded-container charter numbers), and the new
scalar-output audit (tests/test_driver_contract.py
test_gate_outputs_are_scalar_only) passes — all five output columns
are atomic. Next runway candidate (r18): ``graph_node2vec_embeddings``
(plans/extras_graph.py) — the node2vec-fed embedding chain is the
graph family's last uncertified composition, and its former
array-output blocker is resolved by the r17 posexplode discipline
(apply the same (node, norm, d, value) shape BEFORE registering; the
scalar-output contract test makes forgetting impossible). r17
pre-measures at sf0.1 (warm floors, quiet container, the charter's
pre-measure discipline): the EXTRAS row as written (FULL graph) runs
43-61 s — unpromotable; with the gate precedent's 1997Q1 subgraph
bound it reads 7.4 s, and a single-month (1997-01) bound 5.3 s — the
chain's fixed stage count dominates, not edge volume, so shrinking
the window further buys little. A promotion must register a BOUNDED
gate variant (the graph_walk_embeddings pattern: new q_graph row, the
full-graph chain stays in EXTRAS + tests) and should budget ~5-7 s of
structural floor — on par with part_entity_resolution — or first cut
the chain's stage count (e.g. fold the per-step bias join). The
bounded variant is PRE-BUILT and parity-proven as
``graph_node2vec_embeddings_97q1`` (extras_graph.py, r17): the r18
rotation is a pure registration move of that row into q_graph.py. Seat
template unchanged: orders_shipments_in_window's interval join is the
candidate only if a dedicated range-join row replaces it; otherwise
nation_customers_suppliers_full's full-outer join (its
coalesce-both-sides machinery also lives in q5's join tree and the
merge family's anti-joins).

r18 rotation: ``nation_customers_suppliers_full`` (FULL OUTER between
two aggregates — the coalesce-both-sides machinery stays gated via
q5's join tree and the merge family's anti-joins, and the exact query
keeps value parity in plans/extras_relational.py) — seat given to
``graph_node2vec_embeddings_97q1`` (plans/q_graph.py), the bounded
second-order (node2vec) embedding chain, the graph family's last
uncertified composition. Pre-promotion checks per the charter: the
chain's fixed stage count was cut FIRST (operators/graph.py r18:
in-row walk-path accumulation + step-1 fusion replaced the per-step
eager checkpoints with one barrier — bounded-chain warm floor
7.23 → 5.50 s at sf0.1, same-load A/B, walks bit-identical under the
cross-engine parity tests), the row was already scalar-shaped
(posexploded r17), and the full 50-row sf0.01 replica read ALL MATCH
before the rotation commit.

r17 scalar-output audit (the CORRECTNESS_r16 class): every one of the
50 gate rows AND all 65 EXTRAS rows were schema-audited for
array/map/struct output columns — zero found after posexploding
graph_walk_embeddings (gate) and graph_node2vec_embeddings (the r18
runway candidate, reshaped ahead of promotion). The audit is now
standing machinery, not a one-off: tests/test_driver_contract.py
test_gate_outputs_are_scalar_only pins the gate at the schema level,
and tools/oracle_check.py rejects non-scalar values at run time.
"""

from __future__ import annotations

# r14: the ledger is split into per-family modules purely for
# navigability — same registry, same compare loop, same rows. Import
# order below fixes EXTRAS iteration order (pytest parametrize IDs).
from etl_instagram_spark.plans.extras_base import (  # noqa: F401
    EXTRAS,
    _extra,
    _llm,
)
from etl_instagram_spark.plans import extras_relational as _x_relational  # noqa: E402,F401
from etl_instagram_spark.plans import extras_docs as _x_docs  # noqa: E402,F401
from etl_instagram_spark.plans import extras_emb as _x_emb  # noqa: E402,F401
from etl_instagram_spark.plans import extras_events as _x_events  # noqa: E402,F401
from etl_instagram_spark.plans import extras_graph as _x_graph  # noqa: E402,F401

# public rotated-query faces, re-exported for compatibility
from etl_instagram_spark.plans.extras_relational import (  # noqa: E402,F401
    customer_running_revenue,
    customers_without_urgent_orders,
    orders_date_functions,
    pivot_returnflag_status,
    segment_rollup,
    top10_customers_by_revenue,
)
from etl_instagram_spark.plans.extras_docs import (  # noqa: E402,F401
    docs_minhash_bands,
    docs_top_terms_per_doc,
)
from etl_instagram_spark.plans.extras_emb import emb_ann_lsh_topk  # noqa: E402,F401
from etl_instagram_spark.plans.extras_events import (  # noqa: E402,F401
    events_sessionization,
)
