"""Graph ranking operators — PageRank over an aggregated edge table.

The training-data-pipeline use case is quality-signal propagation: rank
nodes of a derived graph (page/link, document/citation, or — as in the
catalog query — the event-type transition graph) so downstream sampling
can weight documents by the rank of their source. Connected components
(operators/dedup.py) covers the other classic iterative-graph need.

Scale shape: PageRank here runs on an *aggregated* edge table — for the
catalog's event-transition graph that table is bounded by |event_types|²
(data-independent), so the heavy stage at 100 TB is the single
window+groupBy that builds the edges (see timeseries.transition_matrix),
not the iteration. The iteration itself is expressed as unrolled
DataFrame joins so the same code runs unchanged when the node set IS
data-proportional (e.g. a web-domain graph): each step is
join-on-src → groupBy(dst), i.e. two hash exchanges on the edge
partitioning, which AQE broadcasts whenever the rank vector is small.
The rank vector (|nodes| rows, never the edge table) is
localCheckpoint'ed EVERY iteration — the GraphX/GraphFrames cadence.
Cutting less often is a trap this module originally fell into: each
iteration references the previous rank vector more than once, so the
unrolled plan DOUBLES per round between cuts (2^k subplan duplication,
caught by test_plan_quality's join-count pin).

No Python UDFs; the fixpoint is a fixed iteration count (the reference
pattern for rank stability at damping 0.85 is 10-20 rounds), which keeps
the result deterministic and lets an ANSI-SQL oracle unroll the same
rounds as CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str,
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank with uniform teleport and dangling-mass
    redistribution; returns ``(node, pagerank)``.

    Semantics (the classic formulation, e.g. the original
    Brin/Page/Haveliwala papers):

      pr_{t+1}(v) = (1-d)/N + d * [ Σ_{u→v} pr_t(u) * w(u,v)/out_w(u)
                                    + dangling_mass_t / N ]

    where ``out_w(u)`` is u's total outgoing weight and dangling mass is
    the summed rank of nodes with no out-edges (their rank teleports
    uniformly, keeping Σpr = 1 exactly — the invariant the tests pin).
    The dangling mass is computed by CONSERVATION, not by a second scan
    of the rank vector: Σ_v contrib(v) sums pr over exactly the
    non-dangling nodes, so dm = 1 − Σ contrib. That keeps each iteration
    to ONE reference of the previous rank vector (plan growth stays
    linear) and drops the dangling-node semi-join entirely.

    The plan per iteration: ranks ⋈ edges on src (AQE-broadcast when the
    rank vector is small), groupBy(dst) partial-agg, then a left join back
    onto the node set so zero-in-degree nodes keep their teleport share.
    The conservation scalar is a 1-row aggregate joined in by a
    cross-join-on-literal — Catalyst plans it as a broadcast nested loop
    over ONE row, not a data-proportional cartesian.
    """
    e = edges.select(
        F.col(src_col).alias("__src"),
        F.col(dst_col).alias("__dst"),
        F.col(weight_col).cast("double").alias("__w"),
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        # referenced every iteration (left join) + by the initial vector:
        # materialize once instead of re-running the union-distinct
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()  # control-plane scalar: sizes the teleport term
    out_w = e.groupBy("__src").agg(F.sum("__w").alias("__out_w"))
    # normalized transition probability per edge; reused every iteration
    probs = (
        e.join(out_w, "__src")
        .select("__src", "__dst", (F.col("__w") / F.col("__out_w")).alias("__p"))
        .localCheckpoint(eager=False)
    )

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for i in range(iters):
        contrib = (
            ranks.join(probs, ranks["node"] == probs["__src"])
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("__p")).alias("__in"))
        )
        # dm = 1 - Σ contrib (mass conservation; see docstring). contrib is
        # referenced twice (scalar + join) — both hang off the CHECKPOINTED
        # rank vector, so the duplication is one bounded join, not a
        # growing chain.
        s = contrib.agg(F.coalesce(F.sum("__in"), F.lit(0.0)).alias("__s"))
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(s)  # 1-row broadcast scalar, not data-proportional
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + (F.lit(1.0) - F.col("__s")) / n_nodes
                    )
                ).alias("pr"),
            )
        )
        if i + 1 < iters:
            # cut lineage on the |nodes|-row vector only, EVERY round
            # (eager, so the truncated plan is what the next round builds
            # on) — the GraphX cadence; see module docstring for why less
            # often is exponential
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_sql(
    edges_cte: str,
    src: str,
    dst: str,
    weight: str,
    iters: int = 10,
    damping: float = 0.85,
) -> str:
    """ANSI-SQL (DuckDB) twin of :func:`pagerank`: unrolls the same
    ``iters`` rounds as CTEs over an edge relation named ``edges_cte``
    (columns ``src, dst, w`` exposed via the given expressions). Returns
    the CTE chain body; the caller selects from ``pr{iters}``.

    Kept textually parallel to the DataFrame loop on purpose — same
    teleport, same dangling redistribution, same join shape — so the two
    engines agree bit-for-bit modulo float summation order (absorbed by
    the catalog's ROUND)."""
    parts = [
        f"e AS (SELECT {src} AS src, {dst} AS dst, CAST({weight} AS DOUBLE) AS w"
        f" FROM {edges_cte})",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "ow AS (SELECT src, sum(w) AS out_w FROM e GROUP BY 1)",
        "probs AS MATERIALIZED"
        " (SELECT src, dst, w / out_w AS p FROM e JOIN ow USING (src))",
        "pr0 AS (SELECT node, 1.0 / n AS pr FROM nodes, nn)",
    ]
    for i in range(iters):
        prev, cur = f"pr{i}", f"pr{i + 1}"
        # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs once per
        # reference, and c{i} is referenced twice per round (scalar + join)
        # — inlined, the plan doubles per round and the PLANNER goes 2^iters
        # (the exact dual of the DataFrame loop's lineage-cut requirement).
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT dst AS node, sum(pr * p) AS contrib"
            f" FROM {prev} JOIN probs ON {prev}.node = probs.src GROUP BY 1)"
        )
        # dangling mass by conservation, mirroring the DataFrame loop:
        # sum(contrib) covers exactly the non-dangling rank mass
        parts.append(
            f"s{i} AS (SELECT coalesce(sum(contrib), 0.0) AS s FROM c{i})"
        )
        parts.append(
            f"{cur} AS (SELECT nodes.node,"
            f" (1.0 - {damping}) / n + {damping} *"
            f" (coalesce(contrib, 0.0) + (1.0 - s) / n) AS pr"
            f" FROM nodes LEFT JOIN c{i} USING (node), nn, s{i})"
        )
    return ",\n".join(parts)
