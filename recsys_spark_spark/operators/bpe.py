"""Iterative BPE tokenizer TRAINING, Spark-native (r13 — completes
the single-iteration primitive ``plans/llm.py::corpus_bpe_pair_counts``
into the full Sennrich et al. 2016 trainer).

Why the shape is right at 100 TB: the corpus is scanned ONCE, into
the distinct-word frequency table (map-side-combinable groupBy; the
shuffle is vocabulary-wide, not corpus-wide) — every training
iteration thereafter runs over that vocabulary relation only:

    1. adjacent-pair counts weighted by word frequency (explode over
       symbol arrays, one hash aggregate);
    2. argmax pair = a 1-ROW ``orderBy().limit(1)`` collect — planned
       as TakeOrderedAndProject (per-partition top-1, tiny driver
       merge), the only driver state in the loop: O(n_merges) strings,
       the model itself;
    3. merge application = a pure column fold (``F.aggregate`` with a
       (out, pending) struct accumulator) rewriting each word's symbol
       array in place — leftmost, non-overlapping, the reference BPE
       pass semantics.

Lineage discipline: each iteration's plan nests an aggregate fold
inside the previous one, so the vocabulary relation is
``localCheckpoint``-ed every ``checkpoint_every`` merges (the
pointer-jumping components precedent, operators/components.py) —
without it a 1000-merge train would build a 1000-deep expression
tree and die in analysis long before execution.

Determinism: ties in the argmax break on (count DESC, a ASC, b ASC),
so the learned merge list is a pure function of the corpus — the
property that lets the golden tests pin it against a pure-Python
reference implementation (tests/test_bpe.py) and lets two clusters
train byte-identical tokenizers.

Encoding new text replays the learned merges in order
(:func:`apply_merges`) — same fold, same checkpoint discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: checkpoint the vocabulary relation every this many merges (plan
#: depth bound; each merge adds one aggregate-fold layer)
CHECKPOINT_EVERY = 8


def word_vocab(
    docs: DataFrame, text_col: str = "text", min_len: int = 1
) -> DataFrame:
    """(word, n) distinct-word frequencies — the ONE corpus-wide scan
    of BPE training; everything after runs at vocabulary width."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.length("word") >= min_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def init_symbols(vocab: DataFrame) -> DataFrame:
    """(syms array<string>, n): each word split to single-character
    symbols — the stage-0 state of training."""
    # (?!^)(?=.) splits at every between-character position — the
    # bare (?!^) also matches at end-of-string and yields a trailing
    # empty symbol (caught by the golden twin: merge ('t','') ranked)
    return vocab.select(
        F.split(F.col("word"), "(?!^)(?=.)").alias("syms"), F.col("n")
    )


def _adjacent_pairs(syms):
    """array<struct<a,b>> of adjacent symbol pairs (try_element_at is
    1-based and NULL-safe out of range — bracket indexing would throw
    under Spark 4 ANSI mode)."""
    return F.expr(
        "filter(transform(syms, (x, i) ->"
        " struct(x AS a, try_element_at(syms, i + 2) AS b)),"
        " p -> p.b IS NOT NULL)"
    )


def pair_counts(sym_vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): corpus-weighted adjacent-pair frequencies over the
    symbol vocabulary."""
    return (
        sym_vocab.select(
            F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "n"
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def top_pair(sym_vocab: DataFrame) -> tuple[str, str, int] | None:
    """The next merge rule: argmax pair by (cnt DESC, a ASC, b ASC) —
    one TakeOrderedAndProject row to the driver (O(1) state)."""
    rows = (
        pair_counts(sym_vocab)
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(1)
        .collect()
    )
    if not rows:
        return None
    r = rows[0]
    return (r["a"], r["b"], r["cnt"])


def apply_merge(sym_vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every symbol array merging adjacent (a, b) -> a+b,
    LEFTMOST and NON-OVERLAPPING within the pass (after a merge the
    scan restarts at the next symbol — [a,a,a] under merge (a,a)
    becomes [aa, a], the reference semantics)."""
    return sym_vocab.select(
        _merge_col(F.col("syms"), a, b).alias("syms"), F.col("n")
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = CHECKPOINT_EVERY,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a document corpus;
    returns the ordered rule list (the tokenizer model).  Stops early
    when no adjacent pair remains.  Driver state is the rule list
    only; per-iteration work is one aggregate + one fold over the
    vocabulary relation (see module docstring)."""
    sym = init_symbols(word_vocab(docs, text_col))
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        if i % checkpoint_every == 0:
            sym = sym.localCheckpoint(eager=True)
        best = top_pair(sym)
        if best is None:
            break
        a, b, _ = best
        merges.append((a, b))
        sym = apply_merge(sym, a, b)
    return merges


def apply_merges(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "tokens",
    checkpoint_every: int = CHECKPOINT_EVERY,
) -> DataFrame:
    """ENCODE: tokenize a word relation with a learned rule list —
    replays the merges in training order over char-split symbols.
    Returns the input columns + ``out_col`` (array<string>)."""
    cols = words.columns
    enc = words.select(
        F.split(F.col(word_col), "(?!^)(?=.)").alias("syms"), *cols
    )
    for i, (a, b) in enumerate(merges):
        if i and i % checkpoint_every == 0:
            enc = enc.localCheckpoint(eager=True)
        enc = enc.select(
            _merge_col(F.col("syms"), a, b).alias("syms"), *cols
        )
    return enc.select(*cols, F.col("syms").alias(out_col))


def _merge_col(syms, a: str, b: str):
    """The apply_merge fold as a bare column expression (shared by
    the vocab rewrite and the encoder so the two cannot drift)."""
    merged = F.lit(a + b)
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("p"),
        ),
        lambda acc, x: (
            F.when(
                acc["p"].isNull(),
                F.struct(acc["out"].alias("out"), x.alias("p")),
            )
            .when(
                (acc["p"] == la) & (x == lb),
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("p"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["p"])).alias("out"),
                    x.alias("p"),
                )
            )
        ),
        lambda acc: F.when(acc["p"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["p"]))
        ),
    )
