"""Shared bench configuration: query sets and the sf1 ratio-gate policy.

Imported by bench.py (per-round driver bench) and scripts/bench_100x.py
(the 100× structured artifact) so the two stay in lockstep — an
exemption added here is automatically checked at BOTH scale legs.
"""

# Headline set: the operators whose physical plans matter most at scale —
# wide aggregation, broadcast-join chain, range-refine join, sessionization
# windows, shingle/LSH dedup, vector search, climatology rollup.
HEADLINE = [
    "q01_pricing_summary",
    "q02_filter_pushdown_revenue",
    "q10_broadcast_dim_join",
    "q13_range_refine_join",
    "q17_sessionize_islands",
    "q18_sessionize_gap_merge",
    "q20_climatology_monthly",
    "q25_dedup_keep_first",
    "q31_ngram_jaccard_neardup",
    "q32_minhash_lsh_neardup",
    "q33_simhash_neardup",
    "q34_knn_bruteforce",
    "q40_ivf_knn",
    "q41_grid_kernel",
]

# Round-4 sketch/ANN/LM operators, timed at both legs and recorded under
# "round4_detail" in BENCH_DETAIL.json (VERDICT r04 item 4). Kept OUT of
# the headline total so the headline stays comparable across rounds.
SKETCH_DETAIL = [
    "q106_kmins_distinct",
    "q108_bigram_perplexity",
    "q111_sketch_setops",
    "q115_ivfpq_knn",
]

# Round-5 graph family + prefix-filter sim-join ("round5_detail"). These
# queries do most of their work eagerly at DataFrame construction
# (per-round eager localCheckpoints, persisted edge tables reused across
# reps), so for them the honest Spark-vs-DuckDB comparison is build+exec
# — see ratio_with_build in leg_summary.
GRAPH_DETAIL = [
    "q117_transition_pagerank",
    "q119_neardup_graph_triangles",
    "q120_mutual_knn_graph",
    "q121_neardup_graph_communities",
    "q122_prefix_filter_simjoin",
    "q123_neardup_graph_kcore",
    "q124_seed_expansion_ppr",
    "q125_semantic_cluster_profile",
]

# Round-6 additions whose oracle does EQUIVALENT work (a fair ratio).
# q126-q128 are deliberately excluded: their oracles predict the output
# without replicating the kernel's computation.
ROUND6_DETAIL = [
    "q129_repeated_window_spans",
]

# Gridding kernels (q126 linear, q130 cubic): timed SPARK-ONLY
# ("kernel_detail") — their oracles predict from the affine contract.
KERNEL_DETAIL = [
    "q126_grid_linear_kernel",
    "q130_grid_cubic_kernel",
]

# Per-query sf1 ratio gate (VERDICT r06 item 4, extended to every sf1
# sub-block in r08 per VERDICT r07 item 5): at the 10x leg every gated
# query must be <= SF1_RATIO_GATE x its DuckDB oracle, except the
# documented floor-dominated exemptions below (sub-second absolute times
# where the measured local-mode session/job floor — r5 floor
# decomposition, scripts/floor_split.py — is most of the number, or a
# measured falling ratio at the 100x leg recorded in BENCH_SF10.json).
SF1_RATIO_GATE = 2.0
SF1_GATE_EXEMPT = {
    # q20 exemption REMOVED in r8: the day-level pre-aggregate rewrite of
    # climatology_spans (operators/aggregates.py) dropped the countDistinct
    # Expand; sf1 warm fell 0.79 s -> ~0.1 s (ratio 3.4x -> ~0.7x), gated.
    "q40_ivf_knn": "floor: multi-stage routing, ~1.5 s absolute at sf1 "
    "(r7 BENCH_DETAIL; 0.45 s is the sf0.1 figure); "
    "100x leg inverts the ratio (BENCH_SF10.json)",
    "q25_dedup_keep_first": "SortAggregate fallback: struct min_by buffers "
    "are not hash-aggregable; plan is shuffle-optimal (|users| rows cross) "
    "and 4x faster than the window plan it replaced; hash-able "
    "reformulations measured worse (PERF.md r7 note)",
    "q10_broadcast_dim_join": "floor: broadcast-join chain, ~0.3 s absolute",
    "q13_range_refine_join": "floor: ~1 s absolute, ratio falls with scale",
    "q41_grid_kernel": "floor: grouped-map kernel, ~0.27 s absolute at sf1, "
    "+0.06 s across a 10x data growth (r6 BENCH_DETAIL)",
    "q115_ivfpq_knn": "PQ/ADC scan is Arrow-batched numpy kernels vs "
    "DuckDB's native columnar loop at a fixture that still fits its "
    "cache; sf1 ratio ~2.2x, and the 100x leg PROVES the inversion: the "
    "oracle leg was aborted after 5100 s wall vs spark's 121 s "
    "(BENCH_SF10.json duckdb_skipped → ratio < 0.024 as a bound) — same "
    "inversion family as q40",
}
