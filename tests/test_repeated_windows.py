"""repeated_window_spans (q129): sliding-window exact-duplicate span
detection with known-structure fixtures."""

from __future__ import annotations


from oco3_data_transformer_spark.operators.dedup import repeated_window_spans

W = 4


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = repeated_window_spans(df, "doc_id", "text", window=W, min_count=2)
    return {r.id: r.asDict() for r in out.collect()}


def test_cross_doc_duplicate_at_different_alignments(spark):
    # the 6-token phrase appears mid-doc in 0 and at the start of 1:
    # windows slide by 1, so both docs mark 3 windows (6 - W + 1) merging
    # into ONE span of 6 tokens each
    phrase = "alpha beta gamma delta epsilon zeta"
    docs = [
        (0, "one two three " + phrase + " nine ten"),
        (1, phrase + " completely different tail here now"),
        (2, "nothing shared with anything else at all"),
    ]
    got = _run(spark, docs)
    for d in (0, 1):
        assert got[d]["n_dup_windows"] == 3
        assert got[d]["n_spans"] == 1
        assert got[d]["covered_tokens"] == 6
    assert got[2]["n_spans"] == 0 and got[2]["covered_tokens"] == 0
    assert got[2]["n_windows"] == 7 - W + 1  # 7 tokens


def test_two_separate_spans_not_merged_across_gap(spark):
    p1 = "red orange yellow green"  # W tokens: exactly 1 window each
    p2 = "cyan blue indigo violet"
    docs = [
        (0, p1 + " w x y z q r s t " + p2),  # gap of 8 > W between hits
        (1, p1 + " unrelated middle piece okay " + p2),
    ]
    got = _run(spark, docs)
    assert got[0]["n_spans"] == 2
    assert got[0]["covered_tokens"] == 8  # two spans of W tokens
    assert got[1]["n_spans"] == 2


def test_self_repeat_within_one_doc_counts(spark):
    # min_count counts global occurrences, including within one doc
    docs = [(0, "ping pong ding dong xx ping pong ding dong"),
            (1, "totally unrelated words that never repeat here")]
    got = _run(spark, docs)
    assert got[0]["n_dup_windows"] == 2  # the phrase's window, twice
    assert got[0]["n_spans"] == 2


def test_short_doc_yields_zero_windows(spark):
    docs = [(0, "tiny doc"), (1, "tiny doc")]
    got = _run(spark, docs)
    assert got[0]["n_windows"] == 0 and got[0]["n_spans"] == 0


def test_token_boundaries_never_alias(spark):
    # r10 keying regression pin: windows are keyed by xxhash64 over the
    # slice of per-token hashes. The array hash folds element count and
    # order, so token sequences that CONCATENATE identically (["ab","c"]
    # vs ["a","bc"]) must still key apart — the injectivity the old
    # " "-joined string keying had by construction.
    docs = [
        (0, "ab c ab c ab c"),    # windows of ["ab","c",...] repeat
        (1, "a bc a bc a bc"),    # same concatenation, different tokens
    ]
    got = _run(spark, docs)
    # each doc self-repeats its own windows, but docs 0 and 1 must not
    # count each other's windows as duplicates: with W=4 each doc has 3
    # windows, all internally duplicated (every window appears >= 2x
    # within its own doc via the sliding repeat)
    for d in (0, 1):
        assert got[d]["n_windows"] == 3
    # the real assertion: a doc whose windows only "match" the OTHER doc
    # under concatenation-aliasing shows zero duplicated windows
    docs2 = [
        (0, "ab c xx yy zz qq"),
        (1, "a bc xx yy zz qq"),
    ]
    got2 = _run(spark, docs2)
    # shared suffix "xx yy zz qq" gives exactly 1 common window
    # ["xx","yy","zz","qq"]; the aliasing prefixes must contribute none
    for d in (0, 1):
        assert got2[d]["n_dup_windows"] == 1
        assert got2[d]["covered_tokens"] == W


def test_no_python_udfs_in_plan(spark):
    df = spark.createDataFrame([(0, "a b c d e f")], "doc_id long, text string")
    out = repeated_window_spans(df, "doc_id", "text", window=W)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
