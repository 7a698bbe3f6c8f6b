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


# --- batched greedy (r15) ----------------------------------------------------
# The batched trainer must replay the one-at-a-time schedule EXACTLY;
# these corpora are built to trip every unsound batching shortcut.

#: (z,a):95 overlaps the best pair (a,b):100 — naive "skip conflicting,
#: keep collecting" batching would take (c,d):90 second, but the
#: sequential schedule takes (z,a) second: merging (a,b) does not touch
#: the "zaq" occurrences, so (z,a) still counts 95 > 90.
OVERLAP_TRAP = {"zaq": 95, "ab": 100, "cd": 90}

#: doubled pair (a,a):300 — merging it CREATES (aa,aa):100 > (c,d):50,
#: so nothing may batch behind a doubled pair.
DOUBLED_TRAP = {"aaaa": 100, "cd": 50}

#: created-pair trap: merging (a,b):100 creates (z,ab):95 > (c,d):90 —
#: the batch must end at the strict count drop before (c,d).
CREATED_TRAP = {"zab": 95, "ab": 5, "cd": 90}


def test_batched_trainer_handles_adversarial_corpora(spark):
    """budget=None forces the DISTRIBUTED batched loop — the soundness
    target of these traps (the local path is covered separately)."""
    for wc in (OVERLAP_TRAP, DOUBLED_TRAP, CREATED_TRAP, SENNRICH):
        docs = _docs_from_counts(spark, wc)
        got = train_bpe(docs, 6, local_vocab_budget=None)
        want = _py_train(wc, 6)
        assert got == want, (wc, got, want)


def test_batched_matches_sequential_trainer(spark):
    """batch_top_m=1 degenerates to the r13 one-merge-per-job loop;
    the default batched schedule must learn the same model.  Both run
    the DISTRIBUTED path (budget=None) so the degenerate-batch claim
    is tested on the Spark loop itself."""
    docs = _docs_from_counts(spark, SENNRICH)
    assert train_bpe(docs, 8, local_vocab_budget=None) == train_bpe(
        docs, 8, batch_top_m=1, local_vocab_budget=None
    )


def test_local_and_distributed_paths_learn_the_same_model(spark):
    """The bounded local path (default: vocab fits the driver budget)
    and the distributed batched loop must learn identical rule lists —
    the SOM local-vs-distributed equivalence discipline."""
    for wc in (SENNRICH, OVERLAP_TRAP, DOUBLED_TRAP, CREATED_TRAP):
        docs = _docs_from_counts(spark, wc)
        local = train_bpe(docs, 8)  # default budget → local path
        dist = train_bpe(docs, 8, local_vocab_budget=None)
        assert local == dist == _py_train(wc, 8), wc


def test_incremental_local_trainer_matches_recount_twin():
    """Property: _train_local's incremental pair-count maintenance +
    lazy-heap argmax equals the recount-every-iteration twin on random
    corpora (pure driver logic, no Spark)."""
    import random

    from recsys_spark_spark.operators.bpe import _train_local

    rng = random.Random(11)
    alphabet = "aabbc"
    for trial in range(300):
        wc = {
            "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 7))
            ): rng.randint(1, 9)
            for _ in range(rng.randint(1, 10))
        }
        n = rng.randint(1, 15)
        got = _train_local(list(wc.items()), n)
        assert got == _py_train(wc, n), (trial, wc, n, got)


def test_select_merge_batch_is_sound_on_random_corpora():
    """Property: on random corpora the batched schedule equals the
    pure-Python sequential twin (pure driver logic — replays
    _select_merge_batch over python pair counts, no Spark)."""
    import random

    from recsys_spark_spark.operators.bpe import _select_merge_batch

    def batched_train(wc, n_merges, m=8):
        vocab = {w: (list(w), n) for w, n in wc.items()}
        merges, created = [], set()
        while len(merges) < n_merges:
            pairs: Counter = Counter()
            for syms, n in vocab.values():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += n
            if not pairs:
                break
            top = sorted(
                pairs.items(), key=lambda kv: (-kv[1], kv[0])
            )[:m]
            top = [(a, b, c) for (a, b), c in top]
            batch = _select_merge_batch(
                top,
                created,
                limit=n_merges - len(merges),
                complete=len(top) < m,
            )
            assert batch, "non-empty counts must yield >= 1 merge"
            for a, b in batch:
                merges.append((a, b))
                created.add(a + b)
                vocab = {
                    w: (_py_merge(s, a, b), n) for w, (s, n) in vocab.items()
                }
        return merges

    rng = random.Random(7)
    alphabet = "aabbc"  # doubled letters → frequent ties and runs
    for trial in range(200):
        wc = {
            "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 6))
            ): rng.randint(1, 9)
            for _ in range(rng.randint(1, 8))
        }
        n = rng.randint(1, 12)
        assert batched_train(wc, n) == _py_train(wc, n), (trial, wc, n)
