"""Iterative BPE trainer (operators/bpe.py): golden merges on the
classic Sennrich corpus, a pure-Python reference twin (the NumPy-twin
discipline of the SOM/ALS goldens), leftmost-non-overlap semantics,
and encode/train consistency."""

from __future__ import annotations

from collections import Counter

from recsys_spark_spark.operators.bpe import (
    apply_merge,
    apply_merges,
    init_symbols,
    train_bpe,
    word_vocab,
)


# --- pure-Python reference twin ---------------------------------------------
def _py_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_train(word_counts: dict[str, int], n_merges: int):
    vocab = {w: (list(w), n) for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # (cnt DESC, a ASC, b ASC) — the trainer's documented tie rule
        (a, b), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        vocab = {w: (_py_merge(s, a, b), n) for w, (s, n) in vocab.items()}
    return merges


def _docs_from_counts(spark, wc: dict[str, int]):
    text = " ".join(w for w, n in wc.items() for _ in range(n))
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_trainer_matches_python_twin_on_sennrich_corpus(spark):
    docs = _docs_from_counts(spark, SENNRICH)
    got = train_bpe(docs, 8)
    want = _py_train(SENNRICH, 8)
    assert got == want
    # hand-pinned head of the classic example: 'es' (9) then 'est' (9)
    assert got[0] == ("e", "s") and got[1] == ("es", "t")


def test_merge_is_leftmost_non_overlapping(spark):
    sym = init_symbols(
        word_vocab(spark.createDataFrame([(1, "aaa aaaa")], "id long, text string"))
    )
    out = {
        tuple(r["syms"])
        for r in apply_merge(sym, "a", "a").collect()
    }
    assert out == {("aa", "a"), ("aa", "aa")}


def test_encode_replays_training_merges(spark):
    """Encoding the training words with the learned rules must yield
    exactly the trainer's final vocabulary state (shared fold, shared
    order) — and a novel word tokenizes by the same rules."""
    docs = _docs_from_counts(spark, SENNRICH)
    merges = train_bpe(docs, 6)
    words = spark.createDataFrame(
        [(w,) for w in [*SENNRICH, "lowest"]], "word string"
    )
    enc = {
        r["word"]: tuple(r["tokens"])
        for r in apply_merges(words, merges).collect()
    }
    # python-twin final state for the training words
    vocab = {w: list(w) for w in SENNRICH}
    low = list("lowest")
    for a, b in merges:
        vocab = {w: _py_merge(s, a, b) for w, s in vocab.items()}
        low = _py_merge(low, a, b)
    for w in SENNRICH:
        assert enc[w] == tuple(vocab[w]), w
    assert enc["lowest"] == tuple(low)
    # tokenization is lossless
    assert all("".join(t) == w for w, t in enc.items())


def test_trainer_stops_when_no_pairs_remain(spark):
    docs = spark.createDataFrame([(1, "ab ab")], "id long, text string")
    merges = train_bpe(docs, 10)
    assert merges == [("a", "b")]  # one merge exhausts every pair


def test_checkpoint_cadence_does_not_change_the_model(spark):
    docs = _docs_from_counts(spark, SENNRICH)
    assert train_bpe(docs, 7, checkpoint_every=2) == train_bpe(
        docs, 7, checkpoint_every=100
    )
