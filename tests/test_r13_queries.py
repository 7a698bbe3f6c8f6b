"""Round-13 rotation invariants: the three variant-tagged merge rows
(attribution trio, hard-negative family, corpus sampling decision
table) must slice back to their member relations exactly — the merged
row certifies the members, so a drift between a slice and its member
library form would silently weaken the driver row.  Oracle parity for
the merged rows themselves runs in test_oracle_parity.py like every
registered query."""

from __future__ import annotations

from recsys_spark_spark.plans.registry import DEMOTED, QUERIES, _load_all

_load_all()
_ALL = {**QUERIES, **DEMOTED}


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_attribution_merged_slices_equal_members(spark, sf_dir):
    from recsys_spark_spark.plans.windows_extra import (
        events_attribution_last_touch,
        events_attribution_last_touch_chunked,
    )

    merged = _ALL["events_attribution_last_touch"].fn(spark, sf_dir)
    tags = {r["variant"] for r in merged.select("variant").distinct().collect()}
    assert tags == {"plain", "chunked", "streaming"}
    plain = _rows(merged.where("variant = 'plain'").drop("variant"))
    chunked = _rows(merged.where("variant = 'chunked'").drop("variant"))
    assert plain == _rows(events_attribution_last_touch(spark, sf_dir))
    assert chunked == _rows(
        events_attribution_last_touch_chunked(spark, sf_dir)
    )
    # the streaming slice's member equality is pinned by
    # test_r11_queries.py::test_stream_attribution_equals_batch (it
    # runs a real streaming job; no need to run it twice per session)
    assert len(plain) > 0


def test_hard_negatives_merged_slices_equal_members(spark, sf_dir):
    # r14 rotation: the merged row gained the 'overfetch' variant
    # (formerly the standalone embedding_hard_negatives_overfetch row)
    from recsys_spark_spark.plans.ann import (
        embedding_hard_negatives,
        embedding_hard_negatives_ivf,
        embedding_hard_negatives_lsh,
        embedding_hard_negatives_overfetch,
    )

    merged = _ALL["embedding_hard_negatives"].fn(spark, sf_dir)
    tags = {r["variant"] for r in merged.select("variant").distinct().collect()}
    assert tags == {"exact", "ivf", "lsh", "overfetch"}
    for tag, member in (
        ("exact", embedding_hard_negatives),
        ("ivf", embedding_hard_negatives_ivf),
        ("lsh", embedding_hard_negatives_lsh),
        ("overfetch", embedding_hard_negatives_overfetch),
    ):
        got = _rows(merged.where(f"variant = '{tag}'").drop("variant"))
        assert got == _rows(member(spark, sf_dir)), tag
        assert len(got) > 0


def test_corpus_samples_decision_table_equals_members(spark, sf_dir):
    """The merged row composes one scan + a broadcast rate join —
    structurally independent of the member library forms — so pin the
    join-of-members equivalence by value."""
    from recsys_spark_spark.plans.pipeline import (
        corpus_mixture_sample,
        corpus_samples,
        corpus_splits,
    )

    merged = _ALL["corpus_samples"].fn(spark, sf_dir)
    assert merged.columns == [
        "doc_id",
        "lang",
        "n_chars",
        "in_sample",
        "in_strat_sample",
        "source",
        "n_source",
        "rate_ppm",
        "in_mix",
        "split",
    ]
    flags = {
        r["doc_id"]: (r["lang"], r["n_chars"], r["in_sample"], r["in_strat_sample"])
        for r in corpus_samples(spark, sf_dir).collect()
    }
    mix = {
        r["doc_id"]: (r["source"], r["n_source"], r["rate_ppm"], r["in_mix"])
        for r in corpus_mixture_sample(spark, sf_dir).collect()
    }
    split = {
        r["doc_id"]: r["split"] for r in corpus_splits(spark, sf_dir).collect()
    }
    got = {
        r["doc_id"]: (
            (r["lang"], r["n_chars"], r["in_sample"], r["in_strat_sample"]),
            (r["source"], r["n_source"], r["rate_ppm"], r["in_mix"]),
            r["split"],
        )
        for r in merged.collect()
    }
    assert set(got) == set(flags) == set(mix) == set(split)
    for doc_id, (f, m, s) in got.items():
        assert f == flags[doc_id]
        assert m == mix[doc_id]
        assert s == split[doc_id]


def test_merged_away_names_are_gone():
    """A merge must remove the member registrations from BOTH tiers —
    a stale standalone row would burn a rotation slot and desync the
    README/SURVEY counts the parity tests pin."""
    for name in (
        "events_attribution_last_touch_chunked",
        "events_stream_attribution",
        "embedding_hard_negatives_ivf",
        "embedding_hard_negatives_lsh",
        "corpus_mixture_sample",
        "corpus_splits",
    ):
        assert name not in _ALL, name
