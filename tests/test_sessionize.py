"""Sessionization (§2.4) unit + property tests.

Edge cases from FIXTURES.md generation rules and the reference loop's
semantics (ref processors/OCO3SamProcessor.py:356-432, gap-merge :365-375;
SIF inclusive margin + 'none' adoption processors/OCO3SifProcessor.py:368-477;
end-of-file flush :397-399):
  - two same-target runs separated by exactly 1 off-mode row -> merge (CO2
    strict ``gap < margin``, margin=2), swallowed row becomes a member;
  - separated by exactly 2 rows -> CO2 no merge, SIF merge (``<= margin``);
  - run ending at end-of-file;
  - back-to-back different-target runs (boundary without interruption);
  - A,B,A never merges across an intervening kept run;
  - SIF 'none' ids interleaved inside a run adopt the surrounding id.
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from oco3_data_transformer_spark.operators import sessionize as sess

SAM = 4


def _mk(spark, seq):
    """seq: list of (mode, target) tuples in sounding order."""
    rows = [
        {"granule": "g", "sounding_idx": i, "operation_mode": m, "target_id": t}
        for i, (m, t) in enumerate(seq)
    ]
    return spark.createDataFrame(rows)


def _regions(spark, seq, margin=2, merge_inclusive=False, none_id=None):
    df = _mk(spark, seq)
    out = sess.detect_regions(
        df, ["granule"], "sounding_idx", "operation_mode", SAM, "target_id",
        margin=margin, merge_inclusive=merge_inclusive, none_id=none_id,
    )
    return sorted(
        out.select("region_id", "target_id", "start_idx", "stop_excl", "n_mode_rows")
        .collect(),
        key=lambda r: r.start_idx,
    )


def _reference_segment(seq, mode, margin=2, inclusive=False):
    """Direct port of the reference's merge_last_or_append loop semantics
    (slices over the raw index, gap = next.start - last.stop)."""
    runs = []  # (target, start, stop_excl, n_mode)
    cur = None
    for i, (m, t) in enumerate(seq):
        if m == mode:
            if cur is not None and cur[0] == t and cur[2] == i:
                cur = (t, cur[1], i + 1, cur[3] + 1)
            elif cur is not None and cur[0] == t and cur[2] != i:
                runs.append(cur)
                cur = (t, i, i + 1, 1)
            else:
                if cur is not None:
                    runs.append(cur)
                cur = (t, i, i + 1, 1)
        else:
            if cur is not None:
                runs.append(cur)
                cur = None
    if cur is not None:
        runs.append(cur)
    merged = []
    for r in runs:
        gap = r[1] - merged[-1][2] if merged else None
        ok = gap is not None and merged[-1][0] == r[0] and (
            gap <= margin if inclusive else gap < margin
        )
        if ok:
            last = merged.pop()
            merged.append((last[0], last[1], r[2], last[3] + r[3]))
        else:
            merged.append(r)
    return merged


def test_merge_gap_of_one(spark):
    seq = [(SAM, "a")] * 3 + [(0, "x")] + [(SAM, "a")] * 2
    regs = _regions(spark, seq)
    assert len(regs) == 1
    r = regs[0]
    # merged region spans the swallowed row: [0, 6), 5 in-mode rows
    assert (r.start_idx, r.stop_excl, r.n_mode_rows) == (0, 6, 5)


def test_no_merge_gap_of_two_strict(spark):
    seq = [(SAM, "a")] * 3 + [(0, "x")] * 2 + [(SAM, "a")] * 2
    regs = _regions(spark, seq)
    assert [(r.start_idx, r.stop_excl) for r in regs] == [(0, 3), (5, 7)]


def test_merge_gap_of_two_inclusive_sif(spark):
    seq = [(SAM, "a")] * 3 + [(0, "x")] * 2 + [(SAM, "a")] * 2
    regs = _regions(spark, seq, merge_inclusive=True)
    assert [(r.start_idx, r.stop_excl) for r in regs] == [(0, 7)]


def test_run_to_end_of_file(spark):
    seq = [(0, "x")] * 2 + [(SAM, "b")] * 4
    regs = _regions(spark, seq)
    assert [(r.start_idx, r.stop_excl, r.target_id) for r in regs] == [(2, 6, "b")]


def test_back_to_back_different_targets(spark):
    seq = [(SAM, "a")] * 3 + [(SAM, "b")] * 3
    regs = _regions(spark, seq)
    assert [(r.target_id, r.start_idx, r.stop_excl) for r in regs] == [
        ("a", 0, 3), ("b", 3, 6)
    ]


def test_aba_never_merges(spark):
    seq = [(SAM, "a")] * 2 + [(SAM, "b")] + [(SAM, "a")] * 2
    regs = _regions(spark, seq)
    assert [(r.target_id, r.start_idx) for r in regs] == [("a", 0), ("b", 2), ("a", 3)]


def test_sif_none_adoption_inside_run(spark):
    seq = [(SAM, "t1")] * 2 + [(SAM, "none")] + [(SAM, "t1")] * 2
    regs = _regions(spark, seq, merge_inclusive=True, none_id="none")
    assert [(r.target_id, r.start_idx, r.stop_excl) for r in regs] == [("t1", 0, 5)]


def test_sif_all_none_run_stays_none(spark):
    seq = [(SAM, "none")] * 3
    regs = _regions(spark, seq, merge_inclusive=True, none_id="none")
    assert [(r.target_id,) for r in regs] == [("none",)]


def test_membership_includes_swallowed_rows(spark):
    seq = [(SAM, "a")] * 2 + [(0, "x")] + [(SAM, "a")] * 2
    df = _mk(spark, seq)
    regs = sess.detect_regions(
        df, ["granule"], "sounding_idx", "operation_mode", SAM, "target_id", margin=2
    )
    members = sess.assign_rows_to_regions(
        df.drop("target_id"), regs, ["granule"], "sounding_idx"
    )
    got = sorted(r.sounding_idx for r in members.collect())
    assert got == [0, 1, 2, 3, 4]  # swallowed off-mode row 2 included


def test_membership_degenerate_region_explodes_no_bins(spark):
    """A region with stop_excl <= start_idx must contribute ZERO bin rows:
    Spark's sequence(hi, lo) yields a DESCENDING range, so without the
    guard an empty region silently inflates the join input (the exact
    refine hides it from the output)."""
    df = _mk(spark, [(SAM, "a")] * 3)
    regs = spark.createDataFrame(
        [
            ("g", "r1", 0, 3),     # real region
            ("g", "r0", 2, 2),     # degenerate: empty span
            ("g", "rneg", 5, 1),   # degenerate: inverted span
        ],
        "granule string, region_id string, start_idx long, stop_excl long",
    )
    members = sess.assign_rows_to_regions(df, regs, ["granule"], "sounding_idx")
    got = sorted((r.region_id, r.sounding_idx) for r in members.collect())
    assert got == [("r1", 0), ("r1", 1), ("r1", 2)]
    # the guard acts at the bin-explode, before the join: degenerate
    # regions produce no exploded rows at all
    binned = regs.withColumn(
        "__bin",
        sess.F.explode(
            sess.F.when(
                sess.F.col("stop_excl") > sess.F.col("start_idx"),
                sess.F.sequence(
                    (sess.F.col("start_idx") / 256).cast("long"),
                    ((sess.F.col("stop_excl") - 1) / 256).cast("long"),
                ),
            ).otherwise(sess.F.array().cast("array<long>"))
        ),
    )
    assert binned.count() == 1  # only r1 survives the explode


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from([0, SAM]), st.sampled_from(["a", "b"])),
        min_size=1, max_size=30,
    )
)
def test_property_matches_reference_loop(spark, seq):
    regs = _regions(spark, seq)
    expect = _reference_segment(seq, SAM)
    got = [(r.target_id, r.start_idx, r.stop_excl, r.n_mode_rows) for r in regs]
    assert got == [(t, s, e, n) for t, s, e, n in expect]


def _reference_sif_segment(seq, mode=SAM, margin=2, none_id="none"):
    """Faithful port of the reference's SIF row loop + merge fold
    (ref processors/OCO3SifProcessor.py:377-477): 'none' rows absorb into
    the current run, leading 'none's upgrade to the first real id, and the
    merge is a left fold where |last.stop - item.start| <= margin merges
    when ids match OR either side is 'none' (merged id prefers non-none)."""
    slices = []

    def merge_last_or_append(item):
        if slices:
            last = slices[-1]
            if abs(last[1] - item[0]) <= margin and (
                last[2] == item[2] or none_id in (last[2], item[2])
            ):
                rid = last[2] if last[2] != none_id else item[2]
                slices[-1] = (last[0], item[1], rid)
                return
        slices.append(item)

    in_region, start, tid = False, None, None
    for i, (m, t) in enumerate(seq):
        if m == mode:
            if not in_region:
                in_region, tid, start = True, t, i
            else:
                if tid == none_id:
                    tid = t
                if t != tid:
                    if t == none_id:
                        continue
                    merge_last_or_append((start, i, tid))
                    start, tid = i, t
        else:
            if in_region:
                merge_last_or_append((start, i, tid))
                in_region, tid = False, None
    if in_region:
        merge_last_or_append((start, len(seq), tid))
    return slices


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from([0, SAM]), st.sampled_from(["a", "b", "none"])),
        min_size=1, max_size=30,
    )
)
def test_property_sif_matches_reference_loop(spark, seq):
    regs = _regions(spark, seq, margin=2, merge_inclusive=True, none_id="none")
    expect = _reference_sif_segment(seq)
    got = [(r.start_idx, r.stop_excl, r.target_id) for r in regs]
    assert got == expect


def test_sif_none_chain_merges_like_reference(spark):
    # runs: a, none, none with qualifying gaps — the left fold chains all
    # three into one 'a' region (a windowed merge would orphan the tail)
    seq = (
        [(SAM, "a")] * 2 + [(0, "x")] + [(SAM, "none")] + [(0, "x")] + [(SAM, "none")]
    )
    regs = _regions(spark, seq, margin=2, merge_inclusive=True, none_id="none")
    assert [(r.start_idx, r.stop_excl, r.target_id) for r in regs] == [(0, 6, "a")]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from([0, SAM]), st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=40,
    )
)
def test_property_invariants(spark, seq):
    """SURVEY §5.5 invariants: regions are disjoint ordered intervals; they
    contain every in-mode row and only rows within their extent; no two
    adjacent same-target regions violate the merge margin."""
    regs = _regions(spark, seq)
    n_mode = sum(1 for m, _ in seq if m == SAM)
    assert sum(r.n_mode_rows for r in regs) == n_mode
    prev = None
    for r in regs:
        assert 0 <= r.start_idx < r.stop_excl <= len(seq)
        # every region starts/ends on an in-mode row of its own target
        assert seq[r.start_idx] == (SAM, r.target_id)
        assert seq[r.stop_excl - 1] == (SAM, r.target_id)
        if prev is not None:
            assert r.start_idx >= prev.stop_excl  # disjoint, ordered
            if prev.target_id == r.target_id:
                # un-merged same-target neighbors must be >= margin apart
                assert r.start_idx - prev.stop_excl >= 2
        prev = r
