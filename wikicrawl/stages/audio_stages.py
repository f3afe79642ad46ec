"""Multimodal (audio) actor-pool stages over binary columns.

Same design as image_stages: opaque ``binary`` payloads + typed metadata
flow through small-batch ``map_batches`` actor pools. Unlike the image
path (own codecs), audio needs NO stub at all: WAV/PCM-s16le is a
44-byte RIFF header + raw little-endian samples, implementable with
numpy alone — so decode, windowing and feature extraction here are REAL
end-to-end, deterministic, and library-free.

- :func:`wav_encode` / :func:`wav_decode` — minimal mono PCM-s16le WAV
  (RIFF/WAVE/fmt/data), the actual on-disk format every audio tool reads.
- :class:`DecodeAudio` — bytes -> (decode_ok, sample_rate, n_samples,
  duration_ms); malformed payloads flag, never throw (poison-pill rule).
- :class:`AudioWindows` — clip -> fixed-size windows exploded to rows
  with vectorized per-window features (RMS, zero crossings, peak): one
  reshape + reduction per clip, no per-sample Python.
- :class:`AudioFeatures` — per-clip RMS / ZCR / spectral centroid
  (numpy rfft), the embedding-ish scalar summary.

Scale shape: clips are wide binary rows — batch sizes stay SMALL
(bytes dominate block size), windows multiply row counts so the explode
emits plain numeric columns (the bytes do NOT ride along), and all
state-free stages run as tasks; pass the callables to ``map_batches``
with ``concurrency=N`` for an actor pool when a real decoder needs
per-actor setup.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_RIFF_FMT = "<4sI4s4sIHHIIHH4sI"  # RIFF size WAVE fmt_ 16 1 ch rate bps ba bits data size


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono PCM-s16le WAV bytes from an int16 (or castable) sample array."""
    s = np.asarray(samples, dtype=np.int16)
    data = s.tobytes()
    hdr = struct.pack(
        _RIFF_FMT, b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(data))
    return hdr + data


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """-> (int16 sample array, sample rate). Raises ValueError on a
    malformed header (wrong magic / non-PCM / truncated payload)."""
    if len(data) < 44:
        raise ValueError("truncated WAV header")
    (riff, _sz, wave, _fmt, fmtsz, codec_id, ch, rate, _ba, _blk, bits,
     tag, dsz) = struct.unpack(_RIFF_FMT, data[:44])
    if riff != b"RIFF" or wave != b"WAVE" or tag != b"data":
        raise ValueError("not a RIFF/WAVE/data stream")
    if codec_id != 1 or ch != 1 or bits != 16 or fmtsz != 16:
        raise ValueError("only mono PCM s16le supported")
    if len(data) - 44 < dsz:
        raise ValueError("truncated WAV data")
    return np.frombuffer(data[44:44 + dsz], dtype="<i2"), rate


class DecodeAudio:
    """binary bytes -> decode metadata (actor-pool-able stage)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok, rate, n, dur = [], [], [], []
        for data in batch["bytes"].to_pylist():
            try:
                s, r = wav_decode(data)
                ok.append(True)
                rate.append(r)
                n.append(len(s))
                dur.append(int(len(s) * 1000) // max(r, 1))
            except Exception:
                ok.append(False)
                rate.append(None)
                n.append(None)
                dur.append(None)
        return (batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
                .append_column("sample_rate", pa.array(rate, pa.int32()))
                .append_column("n_samples", pa.array(n, pa.int64()))
                .append_column("duration_ms", pa.array(dur, pa.int64())))


def _window_view(s: np.ndarray, win: int) -> np.ndarray:
    """(n_windows, win) int32 view; the ragged tail is zero-padded."""
    n_win = max(1, -(-len(s) // win))
    padded = np.zeros(n_win * win, dtype=np.int32)
    padded[:len(s)] = s.astype(np.int32)
    return padded.reshape(n_win, win)


class AudioWindows:
    """clip rows -> one row per fixed-size window with vectorized
    features: rms_milli (RMS / full-scale * 1000, floored), zero
    crossings, peak. Emits (id, window_id, n_samples, rms_milli,
    zero_crossings, peak) — numeric columns only, the bytes stay behind."""

    def __init__(self, window_samples: int = 1024, id_col: str = "clip_id"):
        self.win = window_samples
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        out = {self.id_col: [], "window_id": [], "n_samples": [],
               "rms_milli": [], "zero_crossings": [], "peak": []}
        for cid, data in zip(ids, batch["bytes"].to_pylist()):
            try:
                s, _rate = wav_decode(data)
            except Exception:
                continue
            w = _window_view(s, self.win)
            n_win = w.shape[0]
            lens = np.full(n_win, self.win, dtype=np.int64)
            if len(s) % self.win and len(s):
                lens[-1] = len(s) % self.win
            if not len(s):
                lens[-1] = 0
            rms = np.sqrt((w.astype(np.float64) ** 2).sum(axis=1)
                          / np.maximum(lens, 1))
            zc = (np.signbit(w[:, 1:]) != np.signbit(w[:, :-1])).sum(axis=1)
            peak = np.abs(w).max(axis=1)
            out[self.id_col].extend([cid] * n_win)
            out["window_id"].extend(range(n_win))
            out["n_samples"].extend(lens.tolist())
            out["rms_milli"].extend(
                np.floor(rms * 1000 / 32768.0).astype(np.int64).tolist())
            out["zero_crossings"].extend(zc.astype(np.int64).tolist())
            out["peak"].extend(peak.astype(np.int64).tolist())
        id_type = batch.schema.field(self.id_col).type
        return pa.table({
            self.id_col: pa.array(out[self.id_col], id_type),
            "window_id": pa.array(out["window_id"], pa.int64()),
            "n_samples": pa.array(out["n_samples"], pa.int64()),
            "rms_milli": pa.array(out["rms_milli"], pa.int64()),
            "zero_crossings": pa.array(out["zero_crossings"], pa.int64()),
            "peak": pa.array(out["peak"], pa.int64()),
        })


class AudioFeatures:
    """Per-clip scalar summary: rms_milli, zcr_milli (crossings per
    sample * 1000), spectral centroid in Hz (numpy rfft)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms_o, zcr_o, cent_o = [], [], []
        for data in batch["bytes"].to_pylist():
            try:
                s, rate = wav_decode(data)
            except Exception:
                rms_o.append(None)
                zcr_o.append(None)
                cent_o.append(None)
                continue
            if not len(s):
                rms_o.append(0)
                zcr_o.append(0)
                cent_o.append(0)
                continue
            x = s.astype(np.float64)
            rms = float(np.sqrt((x ** 2).mean()))
            zc = int((np.signbit(x[1:]) != np.signbit(x[:-1])).sum())
            mag = np.abs(np.fft.rfft(x))
            freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
            denom = mag.sum()
            cent = float((freqs * mag).sum() / denom) if denom else 0.0
            rms_o.append(int(rms * 1000 / 32768.0))
            zcr_o.append(int(zc * 1000) // len(x))
            cent_o.append(int(cent))
        return (batch.append_column("rms_milli", pa.array(rms_o, pa.int64()))
                .append_column("zcr_milli", pa.array(zcr_o, pa.int64()))
                .append_column("centroid_hz", pa.array(cent_o, pa.int64())))
