"""Property-based checks for the round-5 stdlib codecs and the
exact-substring dedup ops — pure-Python invariants (no Spark session,
so examples are cheap and the strategies can be broad):

- PPM:  decode(encode(pixels)) == pixels for arbitrary rasters, and
  decode tolerates arbitrary header whitespace/comments;
- WAV:  decode(encode(samples, rate)) round-trips for arbitrary int16
  sample arrays and rates, and survives unknown RIFF chunks spliced
  between fmt and data (word-alignment included);
- duplicate spans (NumPy-free driver logic is distributed, so the
  property is checked through the SQL twin instead): every span the
  DuckDB oracle reports for a random corpus is ≥ the window length
  and lies inside its document.
"""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from recsys_spark_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    encode_ppm,
    encode_wav,
)

SETTINGS = settings(derandomize=True, max_examples=40, deadline=None)


@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**16),
)
@SETTINGS
def test_ppm_roundtrip_any_geometry(w, h, seed):
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(pixels)) == pixels).all()


@given(
    pad=st.sampled_from([b" ", b"\n", b"\t", b"\r"]),
    comments=st.integers(0, 3),
)
@SETTINGS
def test_ppm_decode_tolerates_header_noise(pad, comments):
    pixels = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    header = b"P6" + pad
    for c in range(comments):
        header += b"# noise %d\n" % c
    header += b"3" + pad + b"2" + pad * (c + 1 if comments else 1) + b"255\n"
    assert (decode_image(header + pixels.tobytes()) == pixels).all()


@given(
    n=st.integers(0, 300),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**16),
)
@SETTINGS
def test_wav_roundtrip_any_samples(n, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, n, dtype=np.int16)
    got_rate, got = decode_audio(encode_wav(samples, rate))
    assert got_rate == rate and (got == samples).all()


@given(
    chunk_id=st.sampled_from([b"LIST", b"fact", b"cue ", b"junk"]),
    body=st.binary(min_size=0, max_size=9),
)
@SETTINGS
def test_wav_decode_skips_any_foreign_chunk(chunk_id, body):
    samples = np.array([7, -7, 77], dtype=np.int16)
    base = encode_wav(samples, 8000)
    extra = chunk_id + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        extra += b"\0"  # RIFF word alignment
    spliced = base[:36] + extra + base[36:]
    rate, got = decode_audio(spliced)
    assert rate == 8000 and (got == samples).all()


@given(
    seed=st.integers(0, 500),
    n_docs=st.integers(2, 6),
)
@settings(derandomize=True, max_examples=15, deadline=None)
def test_duplicate_spans_oracle_invariants(seed, n_docs):
    """On a random tiny corpus with one planted shared run, the SQL
    twin's spans always (a) cover ≥ the window length, (b) stay inside
    their document, (c) exist in ≥2 docs whenever the planted run is
    long enough."""
    import duckdb

    from recsys_spark_spark.operators.dedup import duplicate_spans_sql

    rng = np.random.default_rng(seed)
    n = 4  # window length
    shared = " ".join(f"s{seed}_{i}" for i in range(n + 2))
    rows = []
    for d in range(n_docs):
        uniq = " ".join(f"u{d}_{i}" for i in range(int(rng.integers(1, 6))))
        text = (uniq + " " + shared) if d < 2 else uniq
        rows.append((d, text))
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    spans = con.sql(duplicate_spans_sql(n, 2, table="docs")).df()
    lens = {r: len(t.split(" ")) for r, t in rows}
    assert set(spans.doc_id) == {0, 1}
    for _, s in spans.iterrows():
        assert s.span_end - s.span_start + 1 >= n
        assert 1 <= s.span_start <= s.span_end <= lens[s.doc_id]
