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


def test_no_python_udfs_in_plan(spark):
    df = spark.createDataFrame([(0, "a b c d e f")], "doc_id long, text string")
    out = repeated_window_spans(df, "doc_id", "text", window=W)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
