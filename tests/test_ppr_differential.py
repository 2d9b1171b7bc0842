"""Differential test for operators/graph.personalized_pagerank: the
DataFrame loop must match a direct numpy power-iteration of the same
formulation (damped, weighted, dangling mass restarting at the seeds) on
randomized graphs — and keep the sum-to-one and seed-proximity
invariants."""

from __future__ import annotations

import random

import numpy as np
import pytest

from oco3_data_transformer_spark.operators.graph import personalized_pagerank


def _reference(edges, seeds, iters, damping):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    for s, d, w in edges:
        P[idx[s], idx[d]] += w / out_w[s]
    t = np.zeros(n)
    in_graph = [s for s in seeds if s in idx]
    for s in in_graph:
        t[idx[s]] = 1.0 / len(in_graph)
    pr = t.copy()
    for _ in range(iters):
        contrib = pr @ P
        dm = 1.0 - contrib.sum()
        pr = (1.0 - damping) * t + damping * (contrib + dm * t)
    return dict(zip(nodes, pr))


def _run(spark, edges, seeds, iters):
    e = spark.createDataFrame(edges, "s string, d string, w double")
    sd = spark.createDataFrame([(s,) for s in seeds], "node string")
    out = personalized_pagerank(e, "s", "d", "w", sd, iters=iters)
    return {r["node"]: r["ppr"] for r in out.collect()}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ppr_matches_numpy_power_iteration(spark, seed):
    rng = random.Random(seed)
    n_nodes = rng.randint(5, 12)
    names = [f"n{i}" for i in range(n_nodes)]
    edges, seen = [], set()
    for _ in range(rng.randint(n_nodes, 3 * n_nodes)):
        s, d = rng.choice(names), rng.choice(names)
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            edges.append((s, d, float(rng.randint(1, 5))))
    drop = names[-1]  # dangling node exercises the seed-restart term
    edges = [e for e in edges if e[0] != drop] or [(names[0], names[1], 1.0)]
    seeds = names[: max(1, n_nodes // 4)] + ["not_in_graph"]
    got = _run(spark, edges, seeds, iters=8)
    want = _reference(edges, seeds, iters=8, damping=0.85)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_ppr_mass_concentrates_near_seeds(spark):
    # two triangles joined by one weak bridge; seeding in triangle 1 must
    # rank ALL of triangle 1 above all of triangle 2
    t1 = [("a", "b", 5.0), ("b", "c", 5.0), ("c", "a", 5.0),
          ("b", "a", 5.0), ("c", "b", 5.0), ("a", "c", 5.0)]
    t2 = [("x", "y", 5.0), ("y", "z", 5.0), ("z", "x", 5.0),
          ("y", "x", 5.0), ("z", "y", 5.0), ("x", "z", 5.0)]
    bridge = [("c", "x", 1.0), ("x", "c", 1.0)]
    got = _run(spark, t1 + t2 + bridge, ["a"], iters=10)
    assert min(got[n] for n in "abc") > max(got[n] for n in "xyz")


def test_ppr_no_seed_in_graph_raises(spark):
    e = spark.createDataFrame([("a", "b", 1.0)], "s string, d string, w double")
    sd = spark.createDataFrame([("zz",)], "node string")
    with pytest.raises(ValueError):
        personalized_pagerank(e, "s", "d", "w", sd, iters=2)


def test_ppr_distributed_regimes_close(spark):
    # r10: broadcast-rank regime vs sort-merge fallback (gate forced to 0)
    # on the distributed path (kernel='distributed') — float-sum order may
    # differ with partitioning, so equality is to 1e-9 (the q124 contract
    # rounds to 6 dp).
    import random

    rng = random.Random(3)
    edges = [
        (rng.randint(0, 10), rng.randint(0, 10), rng.randint(1, 3))
        for _ in range(30)
    ]
    df = spark.createDataFrame(edges, "a long, b long, w long")
    seeds = spark.createDataFrame([(0,), (1,)], "node long")
    kw = dict(iters=4, kernel="distributed")
    got_b = {
        r["node"]: r["ppr"]
        for r in personalized_pagerank(
            df, "a", "b", "w", seeds, **kw
        ).collect()
    }
    got_d = {
        r["node"]: r["ppr"]
        for r in personalized_pagerank(
            df, "a", "b", "w", seeds, node_broadcast_limit=0, **kw
        ).collect()
    }
    assert set(got_b) == set(got_d)
    for k in got_b:
        assert abs(got_b[k] - got_d[k]) < 1e-9
