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
# Exemption discipline (r7 rule): an exempt query whose ratio RISES from
# sf1 to the 100x leg must be re-fixed or RE-JUSTIFIED with fresh
# evidence, never grandfathered. The r9 calm-window re-measurement
# (BENCH_SF10.assembled_from_runs) supplied that evidence: for every
# scan-bound entry below, SPARK's absolute time grows SUBLINEARLY with
# data (10x rows -> 1.3-4.3x time) and the plan is the pinned-optimal
# one (tests/test_plan_quality.py); the ratio rises only because DuckDB's
# single-node vectorized scan amortizes even better at 1.5 GB — the
# regime that inverts on shapes where algorithms, not constants,
# dominate (q17 0.22x, q31 0.34x, q32 0.16x, q33 0.03x at 100x).
SF1_GATE_EXEMPT = {
    "q01_pricing_summary": "scan-bound engine floor (r10 decomposition, "
    "OPTIMIZATION_r10.md batch 14): calm multi-rep probe puts the full "
    "query at 0.291 s min of which the BARE 6-column scan+decode of the "
    "same lineitem file is 0.251 s (86%) and the job floor 0.077 s — the "
    "two hash aggregates add ~0.04 s. Scan time is FLAT across "
    "maxPartitionBytes 1-8 MiB (0.194-0.206 s): decode/row-group-bound, "
    "not parallelism-bound, so no configuration moves it and the plan "
    "(scan -> partial -> final HashAggregate, pinned) is minimal. DuckDB "
    "scans the same parquet ~1.8x faster per second — the q20 "
    "constant-factor class; absolute time 0.29 s calm / 1.54 s at the "
    "100x fixture (10x rows -> ~5x time, linear scan cost, no "
    "scale-killer)",
    "q20_climatology_monthly": "scan-bound engine floor: the two-hash-"
    "aggregate day-pre-aggregate plan (no Expand, plan-pinned) reads 2 "
    "columns of orders and is 0.42 s absolute at sf1, 0.71 s at the 100x "
    "fixture (10x rows -> 1.7x time); the r8 note recording '~0.1 s' "
    "was an under-measurement, corrected r9 (standalone idle-box reps "
    "0.51-1.0 s). DuckDB scans the same parquet ~4x faster per second — "
    "constant factor, not plan",
    "q40_ivf_knn": "floor: multi-stage routing, ~1.5 s absolute at sf1; "
    "100x leg ratio 1.89 (r9 BENCH_SF10) and the family's oracle "
    "explodes at scale (see q115)",
    "q25_dedup_keep_first": "SortAggregate fallback: struct min_by buffers "
    "are not hash-aggregable; plan is shuffle-optimal (|users| rows cross) "
    "and 4x faster than the window plan it replaced; hash-able "
    "reformulations measured worse (PERF.md r7 note); 100x ratio 2.05",
    "q10_broadcast_dim_join": "broadcast-BUILD floor, decomposed r10 "
    "(VERDICT r09 item 2, scripts/floor_split_q10.py at the 100x "
    "fixture): full leg 2.75 s calm = 0.06 job floor + 0.49 lineitem "
    "scan + 0.18 orders scan + ~1.6 BROADCAST BUILD (driver-side "
    "single-thread collect+hash of the 2.28M filtered-orders rows — "
    "measured in isolation: a 1-row probe against the same broadcast "
    "costs 1.84 s) + ~0.7 probe/agg of 60M rows + 0.23 dim chain. The "
    "build is once-per-query and independent of fact-side rows — the "
    "definition of a floor; DuckDB builds the same hash table "
    "multithreaded in native code, hence the ratio. The plan is "
    "measured-optimal at BOTH the fixture and scale: shuffle_hash "
    "3.16 s, sort-merge 4.73 s vs broadcast 2.52 s on the core join, "
    "and broadcast is the only shape that survives a 100 TB fact side; "
    "past the 64 MB threshold the engine flips to SMJ automatically. "
    "r10 also recovered the probe-stage parallelism (tune_for_input "
    "sizes splits to ~2 waves/core: 2.63 -> 2.28 s)",
    "q13_range_refine_join": "scan-bound engine floor: 0.67 s sf1 -> "
    "0.88 s at 10x data (1.3x for 10x rows); range+refine plan pinned; "
    "ratio 2.23 -> 3.14 per the same DuckDB-amortization effect",
    "q41_grid_kernel": "floor: grouped-map kernel, ~0.23 s absolute at "
    "sf1, 0.32 s at the 100x fixture; r9 calm re-measurement ended the "
    "r8 rising flag (sf1 2.26 -> sf10 2.13, falling)",
    "q115_ivfpq_knn": "PQ/ADC scan is Arrow-batched numpy kernels vs "
    "DuckDB's native columnar loop at a fixture that still fits its "
    "cache; sf1 ratio ~1.9-2.2x, and the 100x leg PROVES the inversion: "
    "the oracle leg was re-aborted r9 at the 900 s cap vs spark's "
    "124.5 s (BENCH_SF10.json duckdb_skipped → ratio < 0.138 bound; the "
    "r8 manual abort bounded it < 0.024 at 5100 s) — same inversion "
    "family as q40",
}
