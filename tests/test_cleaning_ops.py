"""Unit tests for the round-3 cleaning/time-series operator batch:
cross-document segment dedup (C4-style line dedup), blocked edit-distance
near-dup, event debounce, and rolling RANGE-frame features — semantics and
edge cases, independent of the DuckDB parity check."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from oco3_data_transformer_spark.operators import dedup as dedup_ops
from oco3_data_transformer_spark.operators import timeseries as ts_ops


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


BOILER = "aaa bbb ccc ddd"  # one 4-token segment shared by many docs


def _seg_docs(spark):
    rows = [
        # doc 0-2: boilerplate segment then a unique one
        (0, BOILER + " u0a u0b u0c u0d"),
        (1, BOILER + " u1a u1b u1c u1d"),
        (2, BOILER + " u2a u2b u2c u2d"),
        # doc 3: nothing but boilerplate -> reassembles to ''
        (3, BOILER),
        # doc 4: unique only
        (4, "v0 v1 v2 v3 v4"),  # second segment is short ('v4')
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_segment_dedup_removes_boilerplate_and_keeps_order(spark):
    out = {
        r["id"]: r
        for r in dedup_ops.segment_dedup(
            _seg_docs(spark), "doc_id", "text", seg_len=4, min_docs=3
        ).collect()
    }
    assert len(out) == 5
    # boilerplate appears in 4 distinct docs -> dropped everywhere
    assert out[0]["n_seg"] == 2 and out[0]["n_seg_dropped"] == 1
    assert out[0]["clean_md5"] == _md5("u0a u0b u0c u0d")
    # all-boilerplate doc reassembles to the empty string
    assert out[3]["n_seg"] == 1 and out[3]["n_seg_dropped"] == 1
    assert out[3]["clean_md5"] == _md5("")
    # unique doc untouched; short tail segment preserved in order
    assert out[4]["n_seg_dropped"] == 0
    assert out[4]["clean_md5"] == _md5("v0 v1 v2 v3 v4")


def test_segment_dedup_partition_invariant(spark):
    docs = _seg_docs(spark)
    a = sorted(
        map(
            tuple,
            dedup_ops.segment_dedup(docs, "doc_id", "text", 4, 3).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            dedup_ops.segment_dedup(
                docs.repartition(5), "doc_id", "text", 4, 3
            ).collect(),
        )
    )
    assert a == b


def test_edit_distance_pairs_detects_single_token_mutation(spark):
    base = " ".join(f"w{i}" for i in range(40))
    mutated = base.replace("w17", "w17x")  # 1-char insertion
    unrelated = " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, mutated), (3, unrelated)], ["doc_id", "text"]
    )
    rows = dedup_ops.edit_distance_pairs(
        docs, "doc_id", "text", n=3, prefilter_jaccard=0.5, max_rel=0.2
    ).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in rows] == [(1, 2, 1)]


def test_edit_distance_pairs_zero_for_exact_dupes(spark):
    t = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame([(1, t), (2, t)], ["doc_id", "text"])
    rows = dedup_ops.edit_distance_pairs(docs, "doc_id", "text").collect()
    assert len(rows) == 1 and rows[0]["dist"] == 0 and rows[0]["rel_dist"] == 0.0


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, t, v)
         for i, (s, u, t, v) in enumerate(rows)],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )


def test_debounce_chains_extend_bursts(spark):
    # gaps 5s and 7s with gap_s=10: one burst of 3 (membership is relative
    # to the PREVIOUS event, not the burst head)
    ev = _ev(spark, [(0, 1, "a", 1.0), (5, 1, "a", 1.0), (12, 1, "a", 1.0),
                     (40, 1, "a", 1.0),        # new burst: 28s gap
                     (3, 2, "a", 1.0)])        # other key unaffected
    out = sorted(
        ts_ops.debounce(ev, ["user_id", "event_type"], "ts", "event_id", 10).collect(),
        key=lambda r: (r["user_id"], r["burst_id"]),
    )
    assert [(r["user_id"], r["burst_id"], r["n_events"]) for r in out] == [
        (1, 1, 3), (1, 2, 1), (2, 1, 1)
    ]
    assert out[0]["burst_start"] == dt.datetime(2024, 1, 1)


def test_debounce_exact_gap_boundary_stays_in_burst(spark):
    # a gap of exactly gap_s does NOT break the burst (strict >)
    ev = _ev(spark, [(0, 1, "a", 1.0), (10, 1, "a", 1.0)])
    out = ts_ops.debounce(ev, ["user_id", "event_type"], "ts", "event_id", 10).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_rolling_features_window_inclusive_boundary(spark):
    # event at t=3600 includes the t=0 event (RANGE frame inclusive)
    ev = _ev(spark, [(0, 1, "a", 1.5), (3600, 1, "a", 2.25), (7201, 1, "a", 4.0)])
    out = {
        r["event_id"]: r
        for r in ts_ops.rolling_features(
            ev, "user_id", "ts", "event_id", "value", 3600
        ).collect()
    }
    assert out[1]["n_window"] == 2 and out[1]["sum_window"] == 3.75
    # t=7201 excludes t=3600? no: 7201-3600=3601 > 3600 -> excluded
    assert out[2]["n_window"] == 1 and out[2]["sum_window"] == 4.0


def test_rolling_features_partition_invariant(spark):
    ev = _ev(spark, [(i * 7, i % 3, "a", float(i)) for i in range(60)])
    a = sorted(map(tuple, ts_ops.rolling_features(
        ev, "user_id", "ts", "event_id", "value", 20).collect()))
    b = sorted(map(tuple, ts_ops.rolling_features(
        ev.repartition(7), "user_id", "ts", "event_id", "value", 20).collect()))
    assert a == b


def test_interval_overlap_join_matches_naive(spark):
    """Differential test: binned interval join == naive cross-join overlap
    on random interval sets (including multi-bin spans and exact-touch
    boundaries)."""
    import random

    from oco3_data_transformer_spark.operators import joins as join_ops

    rng = random.Random(99)
    T0 = dt.datetime(2024, 1, 1)

    def intervals(n, max_len_s):
        rows = []
        for i in range(n):
            s = rng.randint(0, 50000)
            e = s + rng.randint(0, max_len_s)
            rows.append(
                (i, T0 + dt.timedelta(seconds=s), T0 + dt.timedelta(seconds=e))
            )
        return spark.createDataFrame(rows, ["iid", "start", "end"])

    a, b = intervals(80, 20000), intervals(60, 3000)
    got = sorted(
        (r["a_iid"], r["b_iid"])
        for r in join_ops.interval_overlap_join(
            a, b, "start", "end", "start", "end", bin_s=1800
        ).collect()
    )
    naive = sorted(
        (r["x"], r["y"])
        for r in a.alias("a")
        .crossJoin(b.alias("b"))
        .filter(
            (F.col("a.start") <= F.col("b.end")) & (F.col("b.start") <= F.col("a.end"))
        )
        .select(F.col("a.iid").alias("x"), F.col("b.iid").alias("y"))
        .collect()
    )
    assert got == naive and len(got) > 100


def test_interval_overlap_join_no_nested_loop(spark):
    """The binned form must plan as a hash equi-join on the bin, never a
    BroadcastNestedLoopJoin/CartesianProduct theta-join."""
    from oco3_data_transformer_spark.operators import joins as join_ops

    T0 = dt.datetime(2024, 1, 1)
    a = spark.createDataFrame([(1, T0, T0)], ["iid", "start", "end"])
    b = spark.createDataFrame([(2, T0, T0)], ["iid", "start", "end"])
    plan = join_ops.interval_overlap_join(
        a, b, "start", "end", "start", "end"
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_debounce_burst_end_is_last_event(spark):
    ev = _ev(spark, [(0, 1, "a", 1.0), (5, 1, "a", 1.0), (12, 1, "a", 1.0)])
    out = ts_ops.debounce(ev, ["user_id", "event_type"], "ts", "event_id", 10).collect()
    assert len(out) == 1
    assert out[0]["burst_end"] == dt.datetime(2024, 1, 1, 0, 0, 12)


# ---------------------------------------------------------------------------
# hypothesis property tests
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _ref_debounce(times: list[int], gap_s: int) -> list[tuple[int, int, int]]:
    """Reference loop: (burst_start, burst_end, n) over sorted times."""
    out = []
    for t in sorted(times):
        if out and t - out[-1][1] <= gap_s:
            s, _, n = out[-1]
            out[-1] = (s, t, n + 1)
        else:
            out.append((t, t, 1))
    return out


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=40))
def test_debounce_property_matches_reference_loop(spark, times):
    ev = _ev(spark, [(t, 1, "a", 0.0) for t in times])
    got = sorted(
        (int(r["burst_start"].timestamp() - dt.datetime(2024, 1, 1).timestamp()),
         int(r["burst_end"].timestamp() - dt.datetime(2024, 1, 1).timestamp()),
         r["n_events"])
        for r in ts_ops.debounce(ev, ["user_id", "event_type"], "ts", "event_id", 30).collect()
    )
    assert got == _ref_debounce(times, 30)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=12),
        min_size=1, max_size=12,
    )
)
def test_segment_dedup_property(spark, token_lists):
    """Invariants on random corpora: every doc appears once; n_seg matches
    ceil(len/seg_len); a doc's dropped+kept partition is consistent with a
    reference recount of segment document-frequencies."""
    import math

    seg_len = 2
    min_docs = 2
    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    # reference: segment table + doc-frequency
    segs_by_doc = {}
    from collections import defaultdict

    seg_docs = defaultdict(set)
    for i, toks in enumerate(token_lists):
        segs = [" ".join(toks[j:j + seg_len]) for j in range(0, len(toks), seg_len)]
        segs_by_doc[i] = segs
        for s in segs:
            seg_docs[s].add(i)
    out = {
        r["id"]: r
        for r in dedup_ops.segment_dedup(
            spark.createDataFrame(docs, ["doc_id", "text"]), "doc_id", "text",
            seg_len=seg_len, min_docs=min_docs,
        ).collect()
    }
    assert set(out) == set(range(len(token_lists)))
    for i, toks in enumerate(token_lists):
        r = out[i]
        assert r["n_seg"] == math.ceil(len(toks) / seg_len)
        want_dropped = sum(
            1 for s in segs_by_doc[i] if len(seg_docs[s]) >= min_docs
        )
        assert r["n_seg_dropped"] == want_dropped
        kept = " ".join(s for s in segs_by_doc[i] if len(seg_docs[s]) < min_docs)
        assert r["clean_md5"] == _md5(kept)
