"""BPE tokenizer training (operators/corpus.bpe_train) vs a pure-Python
reference implementation — learned merges AND final symbol tables must agree
exactly, including pair-count tie-breaks, on both crafted and randomized
corpora (the reference-loop testing pattern also used for debounce and
segment dedup)."""

from __future__ import annotations

import random

from oco3_data_transformer_spark.operators import corpus as corpus_ops


def ref_bpe(words: dict[str, int], n_merges: int):
    """Reference BPE: leftmost non-overlapping merge application, argmax by
    (count desc, left asc, right asc)."""
    vocab = {w: [c for c in w] for w in words}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + words[w]
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return vocab, merges


def _spark_bpe(spark, texts: list[str], n_merges: int):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])
    vocab_df, merges = corpus_ops.bpe_train(docs, "text", n_merges)
    vocab = {r.w: (r.freq, list(r.symbols)) for r in vocab_df.collect()}
    return vocab, merges


def _ref_from_texts(texts: list[str], n_merges: int):
    words: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    return ref_bpe(words, n_merges)


def test_bpe_crafted_corpus_matches_reference(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
        "aaaa aaa aa a",  # overlapping-pair stress: greedy leftmost
    ]
    got_vocab, got_merges = _spark_bpe(spark, texts, 10)
    ref_vocab, ref_merges = _ref_from_texts(texts, 10)
    assert got_merges == ref_merges
    for w, syms in ref_vocab.items():
        assert got_vocab[w][1] == syms, w


def test_bpe_randomized_matches_reference(spark):
    rng = random.Random(20260814)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(30)
    ]
    got_vocab, got_merges = _spark_bpe(spark, texts, 6)
    ref_vocab, ref_merges = _ref_from_texts(texts, 6)
    assert got_merges == ref_merges
    for w, syms in ref_vocab.items():
        assert got_vocab[w][1] == syms, w


def test_bpe_merge_count_short_corpus(spark):
    # corpus exhausts before n_merges: every word collapses to one symbol
    got_vocab, got_merges = _spark_bpe(spark, ["ab ab ab"], 50)
    assert got_merges == [("a", "b", 3)]
    assert got_vocab["ab"][1] == ["ab"]


def test_bpe_apply_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide wide wide",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"]
    )
    _, merges = corpus_ops.bpe_train(docs, "text", 6)
    ref_vocab, ref_merges = _ref_from_texts(texts, 6)
    assert [(l, r) for l, r, _ in merges] == [(l, r) for l, r, _ in ref_merges]

    out = corpus_ops.bpe_apply(docs, merges, "text", "id").collect()
    # every token occurrence present, with the reference's exact pieces
    seen = {}
    for r in out:
        assert list(r.pieces) == ref_vocab[r.w], (r.w, r.pieces, ref_vocab[r.w])
        seen.setdefault(r.id, []).append((r.pos, r.w))
    for i, t in enumerate(texts):
        toks = t.split()
        assert sorted(seen[i]) == list(enumerate(toks))


def test_bpe_apply_handles_unseen_words(spark):
    # words absent from training segment with the same folds (no merges hit
    # -> raw characters), never error
    train = spark.createDataFrame([(0, "aa aa ab")], ["id", "text"])
    _, merges = corpus_ops.bpe_train(train, "text", 2)
    score = spark.createDataFrame([(1, "zq aa")], ["id", "text"])
    out = {r.w: list(r.pieces) for r in corpus_ops.bpe_apply(score, merges, "text", "id").collect()}
    assert out["zq"] == ["z", "q"]
    assert out["aa"] == ["aa"]
