"""Graph/entity rows of the rotated/never-gated EXTRAS parity ledger.

Split out of plans/parity_extras.py (r14) purely for navigability —
the registry (plans/extras_base.py), the compare loop
(tests/test_rotated_parity.py), and every row's (spark_fn, oracle_sql)
contract are unchanged. parity_extras.py keeps the ledger's charter
and rotation history and re-exports the public faces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_instagram_spark.plans.extras_base import EXTRAS
from etl_instagram_spark.plans.queries import _t


def _graph_ppr_building_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): PERSONALIZED PageRank — teleport mass confined
    to BUILDING-segment customers, ranking suppliers as seen from that
    segment (the seeded-importance shape: rank a neighborhood from a
    trusted subset). Same int64 kernel as the gate row
    graph_pagerank_suppliers; the mirror replays seeds, init, and every
    iteration in one standalone DuckDB statement."""
    from etl_instagram_spark.operators.graph import (
        bipartite_order_edges,
        pagerank,
    )

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cu = _t(spark, sf_dir, "customer")
    seeds = cu.filter(F.col("c_mktsegment") == "BUILDING").select(
        (F.col("c_custkey") * 2).alias("id")
    )
    ranks = pagerank(bipartite_order_edges(od, li), n_iter=3, seeds=seeds)
    return (
        ranks.filter(F.col("id") % 2 == 1)
        .select(F.expr("(id - 1) div 2").alias("s_suppkey"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), "s_suppkey")
        .limit(15)
    )


def _sql_ppr_building_suppliers() -> str:
    from etl_instagram_spark.operators.graph import (
        BIPARTITE_ORDER_EDGES_SQL,
        pagerank_oracle_sql,
    )

    ctes = pagerank_oracle_sql(
        BIPARTITE_ORDER_EDGES_SQL,
        n_iter=3,
        seeds_sql=(
            "SELECT 2 * c_custkey FROM customer"
            " WHERE c_mktsegment = 'BUILDING'"
        ),
    )
    return f"""
    WITH {ctes}
    SELECT (id - 1) // 2 AS s_suppkey, rank_micro
    FROM r3 WHERE id % 2 = 1
    ORDER BY rank_micro DESC, s_suppkey
    LIMIT 15
    """


def _graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): WEIGHTED PageRank — the walk follows edges in
    proportion to order-line counts (interaction intensity), so heavy
    trading pairs pull rank. Same int64 kernel; per-edge contrib
    (rank·w) div W(u) replayed whole in DuckDB."""
    from etl_instagram_spark.operators.graph import (
        bipartite_order_edges,
        pagerank,
    )

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ranks = pagerank(
        bipartite_order_edges(od, li, weighted=True), n_iter=3, weight_col="w"
    )
    return (
        ranks.filter(F.col("id") % 2 == 1)
        .select(F.expr("(id - 1) div 2").alias("s_suppkey"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), "s_suppkey")
        .limit(15)
    )


def _sql_pagerank_weighted() -> str:
    from etl_instagram_spark.operators.graph import (
        BIPARTITE_ORDER_EDGES_WEIGHTED_SQL,
        pagerank_oracle_sql,
    )

    ctes = pagerank_oracle_sql(
        BIPARTITE_ORDER_EDGES_WEIGHTED_SQL, n_iter=3, weighted=True
    )
    return f"""
    WITH {ctes}
    SELECT (id - 1) // 2 AS s_suppkey, rank_micro
    FROM r3 WHERE id % 2 = 1
    ORDER BY rank_micro DESC, s_suppkey
    LIMIT 15
    """


def _graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r11): redistribute-dangling PageRank over the
    DIRECTED customer→supplier order graph — every supplier is a
    dangling sink, so this row exercises the standard-formulation
    per-round dangling-mass redistribution end to end (int64 share =
    D div N, replayed as a scalar-subquery CTE per round in DuckDB).
    Ranks customers by how much supplier-bounced mass flows back to
    them via the uniform share."""
    from etl_instagram_spark.operators.graph import pagerank

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = od.join(li, od.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    ranks = pagerank(edges, n_iter=3, redistribute_dangling=True)
    return (
        ranks.filter(F.col("id") % 2 == 0)
        .select(F.expr("id div 2").alias("c_custkey"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), "c_custkey")
        .limit(15)
    )


def _sql_graph_pagerank_dangling() -> str:
    from etl_instagram_spark.operators.graph import pagerank_oracle_sql

    ctes = pagerank_oracle_sql(
        "SELECT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst"
        " FROM orders JOIN lineitem ON l_orderkey = o_orderkey",
        n_iter=3,
        redistribute_dangling=True,
    )
    return f"""
    WITH {ctes}
    SELECT id // 2 AS c_custkey, rank_micro
    FROM r3 WHERE id % 2 = 0
    ORDER BY rank_micro DESC, c_custkey
    LIMIT 15
    """


def _part_entity_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r11): SORTED-NEIGHBORHOOD entity blocking
    (operators/entity.sorted_neighborhood_pairs) — pair volume exactly
    n·(window−1) by construction, the hot-block-proof alternative to
    key blocking. The oracle replays the GLOBAL rank (bucket-offset on
    the Spark side, plain row_number in DuckDB), the rank-shifted
    window pairing, and the levenshtein verify, certified by
    order-independent checksums over the full verified pair set (the
    events_ewma convention — every pair contributes, no row emission).
    CC clustering over SNM pairs is deliberately NOT replayed here:
    sorted-name chains form deep graphs beyond any fixed CTE round
    budget (the lcc convergence assert fires, loudly, as designed);
    the engine side uses the O(log n) alternating-star CC, and the CC
    kernel itself is gate-certified via part_entity_resolution /
    docs_dup_cluster_reps."""
    from etl_instagram_spark.operators.entity import (
        sorted_neighborhood_pairs,
    )

    pa = _t(spark, sf_dir, "part")
    pairs = sorted_neighborhood_pairs(
        pa, "p_partkey", "p_name", window=4, max_dist=3
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("id_a").alias("a_checksum"),
        F.sum("id_b").alias("b_checksum"),
        F.countDistinct("id_a").alias("n_distinct_a"),
        F.countDistinct("id_b").alias("n_distinct_b"),
    )


def _sql_part_entity_snm() -> str:
    from etl_instagram_spark.operators.entity import sorted_neighborhood_sql

    snm = sorted_neighborhood_sql(
        "SELECT p_partkey, p_name FROM part", window=4, max_dist=3
    )
    return f"""
    WITH {snm}
    SELECT count(*) AS n_pairs,
           (sum(ia))::BIGINT AS a_checksum,
           (sum(ib))::BIGINT AS b_checksum,
           count(DISTINCT ia) AS n_distinct_a,
           count(DISTINCT ib) AS n_distinct_b
    FROM verified
    """


def _part_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r11): k-core decomposition (operators/graph.k_core)
    — the dense co-purchase backbone after synchronously peeling
    sub-k-degree nodes to a fixpoint. The oracle replays the same peel
    as fixed-round MATERIALIZED CTEs with a LOUD convergence assert
    (too-shallow budgets error out, never silently certify a
    half-peeled graph)."""
    from etl_instagram_spark.operators.graph import copurchase_edges, k_core

    li = _t(spark, sf_dir, "lineitem")
    core = k_core(copurchase_edges(li, min_orders=2), k=3)
    return core.orderBy(F.col("core_degree").desc(), "id").limit(50)


def _sql_part_k_core() -> str:
    from etl_instagram_spark.operators.graph import (
        COPURCHASE_EDGES_SQL,
        k_core_sql,
    )

    # budget 24 >= 2x the measured sf0.01 peel depth of 10 (pinned by
    # tests/test_graph.py::test_k_core_peel_depth_within_half_the_oracle_budget
    # — the CC oracle's margin discipline); converged rounds are no-ops
    ctes = k_core_sql(COPURCHASE_EDGES_SQL.format(min_orders=2), k=3, rounds=24)
    return f"""
    WITH {ctes}
    SELECT id, count(*) AS core_degree
    FROM (SELECT lo AS id FROM core UNION ALL SELECT hi FROM core)
    GROUP BY id
    ORDER BY core_degree DESC, id
    LIMIT 50
    """


def _graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): deterministic DeepWalk-style random walks
    over the customer↔supplier graph — 4 steps from every node, next
    hop = hash32(seed, walk, step) mod outdeg over sorted neighbors, so
    the walk corpus is a pure function of (graph, seed). Per-step
    count / distinct-node / checksum profile replayed in DuckDB."""
    from etl_instagram_spark.operators.graph import (
        bipartite_order_edges,
        random_walks,
    )

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    walks = random_walks(bipartite_order_edges(od, li), walk_len=4)
    return (
        walks.groupBy("step")
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.countDistinct("node").alias("n_distinct_nodes"),
            F.sum("node").alias("node_checksum"),
        )
        .orderBy("step")
    )


def _sql_graph_random_walks() -> str:
    from etl_instagram_spark.operators.graph import (
        BIPARTITE_ORDER_EDGES_SQL,
        random_walks_sql,
    )

    ctes = random_walks_sql(BIPARTITE_ORDER_EDGES_SQL, walk_len=4)
    return f"""
    WITH {ctes}
    SELECT step, count(*) AS n_visits,
           count(DISTINCT node) AS n_distinct_nodes,
           (sum(node))::BIGINT AS node_checksum
    FROM walks GROUP BY step ORDER BY step
    """


def _graph_weighted_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r11): WEIGHTED deterministic walks — the interval
    pick follows edges ∝ order-line count (P(v→u) = w/W(v)) over the
    customer↔supplier graph, with the max_degree hub cap engaged so
    the cap + cumulative-weight machinery certify together. Per-step
    visit/distinct/checksum profile replayed in DuckDB."""
    from etl_instagram_spark.operators.graph import (
        bipartite_order_edges,
        random_walks,
    )

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    walks = random_walks(
        bipartite_order_edges(od, li, weighted=True),
        walk_len=4,
        seed="ww",
        weight_col="w",
        max_degree=32,
    )
    return (
        walks.groupBy("step")
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.countDistinct("node").alias("n_distinct_nodes"),
            F.sum("node").alias("node_checksum"),
        )
        .orderBy("step")
    )


def _sql_graph_weighted_walks() -> str:
    from etl_instagram_spark.operators.graph import (
        BIPARTITE_ORDER_EDGES_WEIGHTED_SQL,
        random_walks_sql,
    )

    ctes = random_walks_sql(
        BIPARTITE_ORDER_EDGES_WEIGHTED_SQL,
        walk_len=4,
        seed="ww",
        weighted=True,
        max_degree=32,
    )
    return f"""
    WITH {ctes}
    SELECT step, count(*) AS n_visits,
           count(DISTINCT node) AS n_distinct_nodes,
           (sum(node))::BIGINT AS node_checksum
    FROM walks GROUP BY step ORDER BY step
    """


def _part_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): triangle counting / clustering coefficients
    over the part co-purchase projection (parts co-occurring on ≥ 3
    orders). Oriented-wedge algorithm — two key-equi joins, every
    triangle found once; the oracle replays projection, orientation,
    wedges, and closure in one statement."""
    from etl_instagram_spark.operators.graph import (
        copurchase_edges,
        triangle_counts,
    )

    li = _t(spark, sf_dir, "lineitem")
    stats = triangle_counts(copurchase_edges(li, min_orders=3))
    return stats.orderBy(F.col("n_triangles").desc(), "id").limit(50)


def _sql_part_triangle_stats() -> str:
    from etl_instagram_spark.operators.graph import (
        COPURCHASE_EDGES_SQL,
        triangle_counts_sql,
    )

    inner = triangle_counts_sql(COPURCHASE_EDGES_SQL.format(min_orders=3))
    return f"""
    SELECT * FROM ({inner})
    ORDER BY n_triangles DESC, id
    LIMIT 50
    """


# (graph_walk_embeddings PROMOTED to the gate at the r16 rotation —
# plans/q_graph.py now certifies the walks→cooc→PPMI→projection chain
# through the driver on the 1997Q1 subgraph, every embedding float
# replayed; seat given by docs_domain_cap, kept in plans/extras_docs.py
# with full parity. The full-graph chain stays bit-checked against
# DuckDB in tests/test_graph_embed.py.)


def _part_communities_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r15): WEIGHTED label propagation — votes carry the
    co-purchase intensity (n_orders), so communities form around
    strongly-co-bought part clusters rather than mere adjacency. Same
    pinned (max vote, min label) argmax on exact int64 sums; same
    per-community size/checksum profile replayed in DuckDB."""
    from etl_instagram_spark.operators.graph import (
        copurchase_edges,
        label_propagation,
    )

    li = _t(spark, sf_dir, "lineitem")
    labels = label_propagation(
        copurchase_edges(li, min_orders=2, weights=True),
        n_rounds=4,
        weight_col="n_orders",
    )
    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("id").alias("member_checksum"),
        )
        .orderBy(F.desc("n_members"), "label")
        .limit(50)
    )


def _sql_part_communities_weighted() -> str:
    from etl_instagram_spark.operators.graph import (
        COPURCHASE_EDGES_WEIGHTED_SQL,
        label_propagation_sql,
    )

    ctes = label_propagation_sql(
        COPURCHASE_EDGES_WEIGHTED_SQL.format(min_orders=2),
        n_rounds=4,
        weighted=True,
    )
    return f"""
    WITH {ctes}
    SELECT label, count(*)::BIGINT AS n_members,
           (sum(id))::BIGINT AS member_checksum
    FROM labels GROUP BY label
    ORDER BY n_members DESC, label
    LIMIT 50
    """


def _graph_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r15): SECOND-ORDER biased walks (node2vec, Grover &
    Leskovec KDD'16) over the customer↔supplier graph at the homophily
    configuration (1, 1, 2) with the hub cap engaged — the distance-2
    membership bias + integer interval pick certify together. Per-step
    visit/distinct/checksum profile replayed in DuckDB (the
    graph_random_walks convention)."""
    from etl_instagram_spark.operators.graph import (
        bipartite_order_edges,
        node2vec_walks,
    )

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    walks = node2vec_walks(
        bipartite_order_edges(od, li),
        walk_len=4,
        seed="n2v",
        far_w=2,
        max_degree=32,
    )
    return (
        walks.groupBy("step")
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.countDistinct("node").alias("n_distinct_nodes"),
            F.sum("node").alias("node_checksum"),
        )
        .orderBy("step")
    )


def _sql_graph_node2vec_walks() -> str:
    from etl_instagram_spark.operators.graph import (
        BIPARTITE_ORDER_EDGES_SQL,
        node2vec_walks_sql,
    )

    ctes = node2vec_walks_sql(
        BIPARTITE_ORDER_EDGES_SQL,
        walk_len=4,
        seed="n2v",
        far_w=2,
        max_degree=32,
    )
    return f"""
    WITH {ctes}
    SELECT step, count(*) AS n_visits,
           count(DISTINCT node) AS n_distinct_nodes,
           (sum(node))::BIGINT AS node_checksum
    FROM walks GROUP BY step ORDER BY step
    """


def _part_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r15): label-propagation communities over the
    co-purchase projection — the source/domain-clustering shape (group
    structurally-entangled sources, then apply mixture caps to the
    CLUSTER). Synchronous fixed-round LPA with the pinned (max votes,
    min label) argmax and the self-vote damping oscillation; every
    count is exact int64, so the per-community size/membership-checksum
    profile replays bit-for-bit in DuckDB."""
    from etl_instagram_spark.operators.graph import (
        copurchase_edges,
        label_propagation,
    )

    li = _t(spark, sf_dir, "lineitem")
    labels = label_propagation(copurchase_edges(li, min_orders=2), n_rounds=4)
    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("id").alias("member_checksum"),
        )
        .orderBy(F.desc("n_members"), "label")
        .limit(50)
    )


def _sql_part_communities() -> str:
    from etl_instagram_spark.operators.graph import (
        COPURCHASE_EDGES_SQL,
        label_propagation_sql,
    )

    ctes = label_propagation_sql(
        COPURCHASE_EDGES_SQL.format(min_orders=2), n_rounds=4
    )
    return f"""
    WITH {ctes}
    SELECT label, count(*)::BIGINT AS n_members,
           (sum(id))::BIGINT AS member_checksum
    FROM labels GROUP BY label
    ORDER BY n_members DESC, label
    LIMIT 50
    """


def _graph_node2vec_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r16): the node2vec-FED embedding chain — the
    composition the graph_embed docstrings promise: second-order biased
    walks (homophily config (1, 1, 2), hub cap 32) emit the same
    (walk_id, step, node) schema first-order walks do, so the
    co-occurrence → PPMI → random-projection chain composes unchanged
    and the top-50 nodes' embedding VECTORS (every float) replay
    bit-for-bit in one DuckDB statement (the graph_walk_embeddings
    contract, now certified for the second-order corpus).

    r17: output posexploded into (node, norm, d, value) scalar rows —
    the same shape fix the gate row took (the driver's pandas
    canonicalization cannot hash array columns), applied here ahead of
    the r18 promotion runway so the registration move is mechanical."""
    from etl_instagram_spark.operators.graph import (
        bipartite_order_edges,
        node2vec_walks,
    )
    from etl_instagram_spark.operators.graph_embed import (
        ppmi_scores,
        walk_cooccurrence,
        walk_embeddings,
    )

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    walks = node2vec_walks(
        bipartite_order_edges(od, li),
        walk_len=4,
        seed="n2e",
        far_w=2,
        max_degree=32,
    )
    emb = walk_embeddings(
        ppmi_scores(walk_cooccurrence(walks, window=2)), dim=8, seed="n2emb"
    )
    top = emb.orderBy(F.desc("norm"), "node").limit(50)
    return top.select(
        "node", "norm", F.posexplode("emb").alias("d", "value")
    )


def _sql_graph_node2vec_embeddings() -> str:
    from etl_instagram_spark.operators.graph import (
        BIPARTITE_ORDER_EDGES_SQL,
        node2vec_walks_sql,
    )
    from etl_instagram_spark.operators.graph_embed import (
        ppmi_sql,
        walk_cooccurrence_sql,
        walk_embeddings_sql,
    )

    ctes = ", ".join(
        [
            node2vec_walks_sql(
                BIPARTITE_ORDER_EDGES_SQL,
                walk_len=4,
                seed="n2e",
                far_w=2,
                max_degree=32,
            ),
            walk_cooccurrence_sql(window=2),
            ppmi_sql(),
            walk_embeddings_sql(dim=8, seed="n2emb"),
        ]
    )
    return f"""
    WITH {ctes},
    gtop AS (SELECT node, norm, emb FROM embs
             ORDER BY norm DESC, node
             LIMIT 50)
    SELECT t.node, t.norm, dd.d, t.emb[dd.d + 1] AS value
    FROM gtop t CROSS JOIN (SELECT unnest(range(8)) AS d) dd
    """


# (graph_node2vec_embeddings_97q1 — the r17-built BOUNDED node2vec
# embedding chain — was PROMOTED to the gate at the r18 rotation, per
# the charter: the row now lives in plans/q_graph.py verbatim; the
# FULL-graph chain below and the walk corpus stay value-parity-kept
# here)


def _register() -> None:
    # never-gated (r10): personalized PageRank — seeded teleport variant
    # of the gate's graph_pagerank_suppliers
    EXTRAS["graph_ppr_building_suppliers"] = (
        _graph_ppr_building_suppliers,
        _sql_ppr_building_suppliers(),
    )
    # never-gated (r10): weighted PageRank — interaction-intensity walk
    EXTRAS["graph_pagerank_weighted"] = (
        _graph_pagerank_weighted,
        _sql_pagerank_weighted(),
    )
    # never-gated (r11): redistribute-dangling PageRank (standard
    # formulation; the directed graph makes every supplier a sink)
    EXTRAS["graph_pagerank_dangling"] = (
        _graph_pagerank_dangling,
        _sql_graph_pagerank_dangling(),
    )
    # never-gated (r11): k-core graph denoising
    EXTRAS["part_k_core"] = (_part_k_core, _sql_part_k_core())
    # never-gated (r11): sorted-neighborhood entity resolution
    EXTRAS["part_entity_snm"] = (
        _part_entity_snm,
        _sql_part_entity_snm(),
    )
    # never-gated (r10): deterministic random-walk corpus profile
    EXTRAS["graph_random_walks"] = (
        _graph_random_walks,
        _sql_graph_random_walks(),
    )
    # never-gated (r11): weighted walks with the hub cap engaged
    EXTRAS["graph_weighted_walks"] = (
        _graph_weighted_walks,
        _sql_graph_weighted_walks(),
    )
    # never-gated (r10): triangles over the co-purchase projection
    EXTRAS["part_triangle_stats"] = (
        _part_triangle_stats,
        _sql_part_triangle_stats(),
    )
    # never-gated (r15): label-propagation communities over the
    # co-purchase projection
    EXTRAS["part_communities"] = (
        _part_communities,
        _sql_part_communities(),
    )
    # never-gated (r15): node2vec second-order biased walks with the
    # hub cap engaged
    EXTRAS["graph_node2vec_walks"] = (
        _graph_node2vec_walks,
        _sql_graph_node2vec_walks(),
    )
    # never-gated (r15): weighted label propagation — co-purchase
    # intensity votes
    EXTRAS["part_communities_weighted"] = (
        _part_communities_weighted,
        _sql_part_communities_weighted(),
    )
    # never-gated (r16): node2vec-fed embedding chain — second-order
    # walks through cooc -> PPMI -> projection, floats bit-replayed
    # (lazy callable: node2vec SQL assembly is the heaviest mirror)
    EXTRAS["graph_node2vec_embeddings"] = (
        _graph_node2vec_embeddings,
        _sql_graph_node2vec_embeddings,
    )


_register()
