"""Audio (binary-column) operators: WAV header decode, PCM windowing,
spectral feature extraction — Arrow-batched `mapInPandas` kernels.

Unlike the image/video kernels (binary_ops.py), the audio path is REAL end
to end with zero external codecs: PCM WAV is a public byte-level spec
(RIFF container, `fmt ` chunk, little-endian PCM frames), so header parse
is `struct.unpack`, sample decode is a numpy `frombuffer`, and features are
numpy FFT — all inside the container's baked-in deps.

Scale shape: every operator is a row-local projection or a row-local
fan-out (windows stay inside the Arrow batch — no Spark-side explode, no
shuffle). Partition count = input file count; repartition upstream when
clips are few-but-huge so each task holds O(1) clips.

Reference parity: the reference has no audio surface; this is part of the
multimodal-column extension mandated by the north star (BASELINE.json),
mirroring the image operators' schema/batch contract
(jigsaw/model_utils/base/mask.py:83-103 is the image analog).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"


def synthesize_wav(
    payload: bytes, sample_rate: int = 8000, n_samples: int = 2048
) -> bytes:
    """Deterministic PCM16-mono WAV fixture from an arbitrary byte payload
    (test/bench fixture generator — real producers hand us real WAVs).
    Samples are a byte-seeded wavetable loop, so identical payloads yield
    identical clips across engines and runs."""
    seed = np.frombuffer(payload, dtype=np.uint8) if payload else np.zeros(1, np.uint8)
    wave = ((seed.astype(np.int32) - 128) * 256).astype(np.int16)
    reps = n_samples // len(wave) + 1
    samples = np.tile(wave, reps)[:n_samples]
    data = samples.tobytes()
    hdr = (
        RIFF_MAGIC
        + struct.pack("<I", 36 + len(data))
        + WAVE_MAGIC
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def parse_wav_header(content: bytes) -> dict | None:
    """RIFF/WAVE `fmt ` + `data` chunk walk (public spec). Returns
    channels / sample_rate / bits / n_samples / data offset, or None when
    the payload is not a WAV."""
    if len(content) < 44 or content[:4] != RIFF_MAGIC or content[8:12] != WAVE_MAGIC:
        return None
    pos, fmt, data_off, data_len = 12, None, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        if cid == b"fmt " and pos + 8 + 16 <= len(content):
            fmt = struct.unpack("<HHIIHH", content[pos + 8 : pos + 24])
        elif cid == b"data":
            data_off, data_len = pos + 8, min(clen, len(content) - pos - 8)
        pos += 8 + clen + (clen & 1)
    if fmt is None or data_off is None:
        return None
    _, channels, rate, _, block_align, bits = fmt
    n_samples = data_len // max(block_align, 1)
    return {
        "channels": channels,
        "sample_rate": rate,
        "bits": bits,
        "n_samples": n_samples,
        "data_off": data_off,
        "data_len": data_len,
    }


def _pcm16_mono(content: bytes) -> np.ndarray | None:
    """Decode PCM16 frames to a mono float array in [-1, 1); multi-channel
    input is averaged down. None for non-WAV / non-PCM16 payloads."""
    meta = parse_wav_header(content)
    if meta is None or meta["bits"] != 16:
        return None
    raw = np.frombuffer(
        content, dtype="<i2", count=(meta["data_len"] // 2), offset=meta["data_off"]
    )
    if meta["channels"] > 1:
        usable = len(raw) - len(raw) % meta["channels"]
        raw = raw[:usable].reshape(-1, meta["channels"]).mean(axis=1)
    return raw.astype(np.float32) / 32768.0


def decode_audio_meta(df: DataFrame) -> DataFrame:
    """(audio_id, content) → + (format, channels, sample_rate, bits,
    n_samples, duration_ms). Real header parse; non-WAV rows yield NULLs
    with format 'unknown'. Pure projection — no shuffle."""

    schema = (
        "audio_id string, length long, format string, channels int, "
        "sample_rate int, bits int, n_samples long, duration_ms double"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["audio_id"], pdf["content"]):
                b = bytes(content)
                meta = parse_wav_header(b)
                if meta is None:
                    rows.append((aid, len(b), "unknown", None, None, None, None, None))
                else:
                    rows.append(
                        (
                            aid,
                            len(b),
                            "wav",
                            meta["channels"],
                            meta["sample_rate"],
                            meta["bits"],
                            meta["n_samples"],
                            round(meta["n_samples"] * 1000.0 / meta["sample_rate"], 3)
                            if meta["sample_rate"]
                            else None,
                        )
                    )
            out = pd.DataFrame(
                rows,
                columns=[
                    "audio_id",
                    "length",
                    "format",
                    "channels",
                    "sample_rate",
                    "bits",
                    "n_samples",
                    "duration_ms",
                ],
            )
            for c, t in (("channels", "Int32"), ("sample_rate", "Int32"), ("bits", "Int32"), ("n_samples", "Int64")):
                out[c] = pd.array(out[c], dtype=t)
            yield out

    return df.mapInPandas(op, schema)


def window_audio(
    df: DataFrame, window: int = 512, hop: int = 256, include_clip_meta: bool = False
) -> DataFrame:
    """Fixed-size analysis windows over decoded PCM: (audio_id, content) →
    exploded child table (audio_id, window_idx, start_sample, rms, peak,
    zero_crossings). The fan-out happens INSIDE the Arrow batch — one input
    row becomes ~n_samples/hop output rows with no Spark-side explode and
    no shuffle; downstream per-window aggregation composes relationally.

    ``include_clip_meta`` adds (sample_rate, n_samples, duration_ms) to
    every window row — the header fields are already parsed for the PCM
    decode, so clip-level metadata costs nothing here, while deriving it
    downstream would need a second decode pass plus a join."""

    schema = (
        "audio_id string, window_idx int, start_sample long, "
        "rms double, peak double, zero_crossings int"
    )
    if include_clip_meta:
        schema += ", sample_rate int, n_samples long, duration_ms double"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for aid, content in zip(pdf["audio_id"], pdf["content"]):
                b = bytes(content)
                samples = _pcm16_mono(b)
                if samples is None:
                    continue
                meta = parse_wav_header(b)
                clip = (
                    meta["sample_rate"],
                    meta["n_samples"],
                    round(meta["n_samples"] * 1000.0 / meta["sample_rate"], 3)
                    if meta["sample_rate"]
                    else None,
                )
                for w, start in enumerate(range(0, max(len(samples) - window + 1, 1), hop)):
                    seg = samples[start : start + window]
                    if not len(seg):
                        continue
                    row = (
                        aid,
                        w,
                        start,
                        float(np.sqrt(np.mean(seg * seg))),
                        float(np.abs(seg).max()),
                        int(np.count_nonzero(np.diff(np.signbit(seg)))),
                    )
                    rows.append(row + clip if include_clip_meta else row)
            cols = ["audio_id", "window_idx", "start_sample", "rms", "peak", "zero_crossings"]
            if include_clip_meta:
                cols += ["sample_rate", "n_samples", "duration_ms"]
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(op, schema)


def extract_audio_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """(audio_id, content) → (audio_id, embedding array<float>): log-scaled
    magnitudes of the first `dim` FFT bins over the whole clip, unit-normed
    — a real spectral signature (rfft over decoded PCM), drop-in compatible
    with the similarity/ANN operators downstream."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, embs = [], []
            for aid, content in zip(pdf["audio_id"], pdf["content"]):
                samples = _pcm16_mono(bytes(content))
                if samples is None:
                    continue
                mags = np.abs(np.fft.rfft(samples))[1 : dim + 1]
                if len(mags) < dim:
                    mags = np.pad(mags, (0, dim - len(mags)))
                vec = np.log1p(mags)
                norm = float(np.linalg.norm(vec)) or 1.0
                ids.append(aid)
                embs.append([float(x) / norm for x in vec])
            # dtype=object keeps Arrow's list<float> conversion on empty
            # batches (a default float64 empty column fails the converter)
            yield pd.DataFrame(
                {"audio_id": ids, "embedding": pd.Series(embs, dtype=object)}
            )

    return df.mapInPandas(op, "audio_id string, embedding array<float>")
