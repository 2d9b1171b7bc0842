"""Decontamination operator vs a brute-force Python reference on random
small corpora (hypothesis)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oco3_data_transformer_spark.operators.dedup import decontaminate

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _shingles(text: str, n: int = 3) -> set:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _ref(corpus, bench, n=3, t=0.2):
    out = {}
    for cid, ctext in corpus:
        cs = _shingles(ctext, n)
        if not cs:
            continue
        hits = []
        for _, btext in bench:
            ov = len(cs & _shingles(btext, n)) / len(cs)
            if ov >= t:
                hits.append(ov)
        if hits:
            out[cid] = (len(cs), len(hits), max(hits))
    return out


docs = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=12).map(" ".join),
    min_size=1, max_size=6,
)


@pytest.mark.usefixtures("spark")
@given(corpus_texts=docs, bench_texts=docs)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_decontaminate_matches_bruteforce(spark, corpus_texts, bench_texts):
    corpus = [(i + 100, t) for i, t in enumerate(corpus_texts)]
    bench = [(i, t) for i, t in enumerate(bench_texts)]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {
        r.id: (r.n_sh, r.n_contaminated, pytest.approx(r.max_overlap))
        for r in decontaminate(cdf, bdf, "doc_id", "text", 3, 0.2).collect()
    }
    expect = _ref(corpus, bench)
    assert set(got) == set(expect)
    for cid, (n_sh, n_cont, mx) in expect.items():
        assert got[cid][0] == n_sh and got[cid][1] == n_cont
        assert got[cid][2] == mx
