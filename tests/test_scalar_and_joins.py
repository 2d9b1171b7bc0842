"""C2 timestamp_from_components and the J2 nearest_centroid tiebreak
(ref processors/OCO3SamProcessor.py:84; processors/OCO2Processor.py:400-435
np.argmin first-index-wins)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from oco3_data_transformer_spark.functions.scalar import timestamp_from_components
from oco3_data_transformer_spark.operators.joins import nearest_centroid


def test_timestamp_from_components(spark):
    df = spark.createDataFrame(
        [([2024, 3, 1, 12, 30, 45, 250000],), ([2019, 12, 31, 23, 59, 59],)],
        "vec array<int>",
    )
    out = [r.ts for r in df.select(timestamp_from_components(F.col("vec")).alias("ts")).collect()]
    assert out[0] == dt.datetime(2024, 3, 1, 12, 30, 45, 250000)
    # missing 7th component counts as 0 microseconds
    assert out[1] == dt.datetime(2019, 12, 31, 23, 59, 59)


def test_asof_join_semantics(spark):
    from oco3_data_transformer_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "k", dt.datetime(2024, 1, 1, 10, 0)),
         (2, "k", dt.datetime(2024, 1, 1, 12, 0)),
         (3, "k", dt.datetime(2024, 1, 1, 9, 0)),   # before any right row
         (4, "z", dt.datetime(2024, 1, 1, 12, 0))], # key with no right rows
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1, 10, 0), 100.0),   # simultaneous with id 1
         ("k", dt.datetime(2024, 1, 1, 11, 30), 200.0)],
        "k string, ts timestamp, v double",
    )
    out = {r.id: (r.v, r["__matched_time"])
           for r in asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()}
    assert out[1] == (100.0, dt.datetime(2024, 1, 1, 10, 0))   # ties match
    assert out[2] == (200.0, dt.datetime(2024, 1, 1, 11, 30))  # latest prior
    assert out[3] == (None, None)                              # nothing before
    assert out[4] == (None, None)                              # key unmatched

    # tolerance: id 2's match is 30 min old -> nulled at 15-min tolerance
    tol = {r.id: r.v for r in asof_join(
        left, right, ["k"], "ts", "ts", ["v"], tolerance_seconds=900
    ).collect()}
    assert tol[1] == 100.0 and tol[2] is None


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_matches_pandas_merge_asof(spark, direction):
    import pandas as pd

    from oco3_data_transformer_spark.operators.joins import asof_join

    rng = random.Random(42)
    left_rows = [
        (i, f"k{rng.randint(0, 3)}", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=rng.randint(0, 500)))
        for i in range(60)
    ]
    right_times = set()
    right_rows = []
    for _ in range(40):
        k = f"k{rng.randint(0, 3)}"
        t = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=rng.randint(0, 500))
        if (k, t) in right_times:  # operator contract: unique (key, time)
            continue
        right_times.add((k, t))
        right_rows.append((k, t, float(rng.randint(1, 999))))
    # force timestamp ties between sides so tie semantics are exercised
    for j, (k, t, v) in enumerate(right_rows[:5]):
        left_rows.append((1000 + j, k, t))

    ldf = spark.createDataFrame(left_rows, "id long, k string, ts timestamp")
    rdf = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")
    got = {
        r.id: r.v
        for r in asof_join(
            ldf, rdf, ["k"], "ts", "ts", ["v"], direction=direction
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts")
    ref = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)
    for row in ref.itertuples(index=False):
        expect = None if pd.isna(row.v) else row.v
        assert got[row.id] == expect, f"id {row.id} ({direction})"


def test_asof_join_subsecond_precision(spark):
    """'nearest' and tolerance must resolve at sub-second granularity:
    unix_timestamp-based gaps truncate to whole seconds and pick the wrong
    side when both candidates fall inside the same second."""
    from oco3_data_transformer_spark.operators.joins import asof_join

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    us = dt.timedelta(microseconds=1)
    left = spark.createDataFrame(
        [(1, "k", base + 400_000 * us)], "id long, k string, ts timestamp"
    )
    # backward candidate 0.4 s away, forward candidate 0.2 s away — equal
    # (0) under whole-second truncation, so only fractional gaps pick fwd
    right = spark.createDataFrame(
        [("k", base, 1.0), ("k", base + 600_000 * us, 2.0)],
        "k string, ts timestamp, v double",
    )
    out = asof_join(
        left, right, ["k"], "ts", "ts", ["v"], direction="nearest"
    ).collect()
    assert out[0].v == 2.0

    # tolerance is fractional too: 0.3 s tolerance keeps the 0.2 s-away
    # match but would not keep a 0.4 s-away one
    tol = asof_join(
        left, right, ["k"], "ts", "ts", ["v"],
        direction="nearest", tolerance_seconds=0.3,
    ).collect()
    assert tol[0].v == 2.0
    tol2 = asof_join(
        left, right, ["k"], "ts", "ts", ["v"],
        direction="backward", tolerance_seconds=0.3,
    ).collect()
    assert tol2[0].v is None


def _ref_argmin(region, targets):
    """The reference's association: np.argmin over squared centroid distance,
    first index wins on ties (targets in list order)."""
    d2 = [(region[0] - t[1]) ** 2 + (region[1] - t[2]) ** 2 for t in targets]
    return targets[d2.index(min(d2))][0]


def test_nearest_centroid_tiebreak_matches_reference_argmin(spark):
    rng = random.Random(7)
    # coarse integer grid so exact distance ties actually occur
    targets = [(i, float(rng.randint(0, 4)), float(rng.randint(0, 4))) for i in range(8)]
    regions = [(j, float(rng.randint(0, 4)), float(rng.randint(0, 4))) for j in range(40)]
    tdf = spark.createDataFrame(targets, ["t_idx", "t_lat", "t_lon"])
    rdf = spark.createDataFrame(regions, ["region_id", "lat_c", "lon_c"])
    out = {
        r.region_id: r.t_idx
        for r in nearest_centroid(
            rdf, tdf, ["region_id"], tiebreak="t_idx"
        ).collect()
    }
    for j, lat, lon in regions:
        assert out[j] == _ref_argmin((lat, lon), targets), f"region {j}"


def test_morton_key_matches_bit_interleave_reference(spark):
    from oco3_data_transformer_spark.functions import scalar as scalar_fns

    df = spark.createDataFrame(
        [(a, b) for a in range(0, 256, 31) for b in range(0, 256, 29)],
        "la int, lo int",
    )
    got = {
        (r.la, r.lo): r.z
        for r in df.select(
            "la", "lo", scalar_fns.morton_key(F.col("la"), F.col("lo")).alias("z")
        ).collect()
    }

    def ref(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    assert all(got[(a, b)] == ref(a, b) for (a, b) in got)
    # locality: any 4096-key block spans at most a 32x32 tile
    for (a, b), z in got.items():
        assert (z // 4096) == (ref(a, b) // 4096)


def _nv1d_rows(df):
    return sorted(
        (r["pid"], r["vid"], r["tag"], r["__dist"])
        for r in df.select("pid", "vid", "tag", "__dist").collect()
    )


def test_nearest_value_1d_regimes_identical(spark):
    """r10: the searchsorted arrow kernel must pick the EXACT rank-1
    (dist asc, key asc) winner the cross+rank-1 sql shape picks —
    adversarial fixture: duplicate values (min-key carry), exact
    cross-side equidistance, probe == value, negatives, probes beyond
    both ends, and a NaN probe (SQL NaN ordering: all dists tie)."""
    from oco3_data_transformer_spark.operators.joins import nearest_value_1d

    values = spark.createDataFrame(
        [
            (7, 10.0, "a"),
            (3, 10.0, "b"),   # duplicate value: key 3 must win, carrying "b"
            (5, 20.0, "c"),
            (9, -4.25, "d"),
            (11, 0.0, "e"),
            (2, 31.5, "f"),
        ],
        "vid long, v double, tag string",
    )
    probes = spark.createDataFrame(
        [
            (1, 15.0),        # exactly equidistant 10.0/20.0 → min key 3
            (2, 10.0),        # exact hit, duplicate group → key 3
            (3, -100.0),      # below every value
            (4, 100.0),       # above every value
            (5, 0.1),
            (6, -2.125),      # equidistant -4.25/0.0 → min key 9
            (7, float("nan")),  # NaN dists all tie → global min key 2
        ],
        "pid long, p double",
    )
    kw = dict(
        probe_key="pid", probe_val="p", value_key="vid", value_val="v",
        carry=("tag",),
    )
    arrow = nearest_value_1d(probes, values, **kw)
    sql = nearest_value_1d(probes, values, kernel="sql", **kw)
    got_a, got_s = _nv1d_rows(arrow), _nv1d_rows(sql)
    import math

    def canon(rows):
        return [
            (p, v, t, None if (d is not None and math.isnan(d)) else d)
            for p, v, t, d in rows
        ]

    assert canon(got_a) == canon(got_s)
    by_pid = {p: (v, t) for p, v, t, _ in got_a}
    assert by_pid[1] == (3, "b")
    assert by_pid[2] == (3, "b")
    assert by_pid[6] == (9, "d")
    assert by_pid[7] == (2, "f")


def test_nearest_value_1d_regimes_identical_random(spark):
    """Randomized differential: 2-decimal doubles (the acctbal shape) with
    engineered collisions; kernel == sql bit-for-bit on winner AND dist."""
    import random as _random

    from oco3_data_transformer_spark.operators.joins import nearest_value_1d

    rng = _random.Random(41)
    vals = [(i, round(rng.uniform(-999.99, 9999.99), 2), f"t{i % 5}") for i in range(400)]
    # force duplicate values so min-key grouping is exercised
    vals += [(1000 + i, vals[i][1], "dup") for i in range(25)]
    probes = [(j, round(rng.uniform(-1200.0, 10500.0), 2)) for j in range(3000)]
    # probes that land exactly midway between two adjacent distinct values
    sv = sorted({v for _, v, _ in vals})
    for j, k in enumerate(range(0, len(sv) - 1, 37)):
        probes.append((9000 + j, (sv[k] + sv[k + 1]) / 2.0))
    vdf = spark.createDataFrame(vals, "vid long, v double, tag string")
    pdf = spark.createDataFrame(probes, "pid long, p double")
    kw = dict(
        probe_key="pid", probe_val="p", value_key="vid", value_val="v",
        carry=("tag",),
    )
    got_a = _nv1d_rows(nearest_value_1d(pdf, vdf, **kw))
    got_s = _nv1d_rows(nearest_value_1d(pdf, vdf, kernel="sql", **kw))
    assert got_a == got_s
