"""Audio multimodal stages: WAV codec round-trip, window features vs
brute force, poison-pill handling, and the Ray Dataset plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from wikicrawl.stages import audio_stages as A


def make_clip(seed: int, n: int, rate: int = 16000) -> bytes:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    tone = 8000 * np.sin(2 * np.pi * 440 * t / rate)
    noise = rng.normal(scale=500, size=n)
    return A.wav_encode((tone + noise).astype(np.int16), rate)


def test_wav_roundtrip():
    s = (np.arange(-5, 5) * 1000).astype(np.int16)
    data = A.wav_encode(s, 8000)
    out, rate = A.wav_decode(data)
    assert rate == 8000
    assert np.array_equal(out, s)
    # empty clip round-trips too
    out0, _ = A.wav_decode(A.wav_encode(np.array([], dtype=np.int16)))
    assert len(out0) == 0


def test_wav_decode_rejects_malformed():
    with pytest.raises(ValueError):
        A.wav_decode(b"oops")
    good = A.wav_encode(np.ones(100, dtype=np.int16))
    with pytest.raises(ValueError):
        A.wav_decode(b"JUNK" + good[4:])
    with pytest.raises(ValueError):
        A.wav_decode(good[:60])  # truncated data


def test_decode_audio_stage_flags_poison():
    batch = pa.table({
        "clip_id": pa.array([0, 1], pa.int64()),
        "bytes": pa.array([make_clip(1, 16000), b"not audio"], pa.binary()),
    })
    out = A.DecodeAudio()(batch)
    assert out["decode_ok"].to_pylist() == [True, False]
    assert out["n_samples"].to_pylist() == [16000, None]
    assert out["duration_ms"].to_pylist() == [1000, None]


def test_audio_windows_match_bruteforce():
    n, win = 5000, 1024  # ragged tail: 5000 = 4*1024 + 904
    data = make_clip(7, n)
    s, _ = A.wav_decode(data)
    batch = pa.table({"clip_id": pa.array([9], pa.int64()),
                      "bytes": pa.array([data], pa.binary())})
    out = A.AudioWindows(window_samples=win)(batch)
    assert out.num_rows == 5
    assert out["n_samples"].to_pylist() == [1024] * 4 + [904]
    for wi in range(5):
        seg = s[wi * win:(wi + 1) * win].astype(np.float64)
        rms = np.sqrt((seg ** 2).mean())
        assert out["rms_milli"][wi].as_py() == int(
            np.floor(rms * 1000 / 32768.0))
        assert out["peak"][wi].as_py() == int(np.abs(seg).max())
        zc = int((np.signbit(seg[1:]) != np.signbit(seg[:-1])).sum())
        # window zc counts crossings WITHIN the (padded) window; the pad
        # adds at most 1 crossing at the tail boundary
        got = out["zero_crossings"][wi].as_py()
        assert abs(got - zc) <= 1


def test_audio_features_tone_centroid():
    rate = 16000
    t = np.arange(rate)
    tone = (8000 * np.sin(2 * np.pi * 1000 * t / rate)).astype(np.int16)
    batch = pa.table({"bytes": pa.array([A.wav_encode(tone, rate)],
                                        pa.binary())})
    out = A.AudioFeatures()(batch)
    assert abs(out["centroid_hz"][0].as_py() - 1000) < 150  # pure-ish tone
    # 1 kHz tone -> 2000 crossings/s -> zcr_milli ~ 125 (endpoint effects)
    assert abs(out["zcr_milli"][0].as_py() - 125) <= 1


def test_audio_pipeline_through_ray(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "clip_id": np.arange(6, dtype=np.int64),
        "bytes": [make_clip(i, 3000 + 500 * i) for i in range(5)]
        + [b"poison"],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    dec = ds.map_batches(A.DecodeAudio(), batch_format="pyarrow",
                         batch_size=2).to_pandas()
    assert dec.decode_ok.sum() == 5
    wins = ds.map_batches(A.AudioWindows(window_samples=512),
                          batch_format="pyarrow", batch_size=2).to_pandas()
    # poison clip contributes nothing; others explode to ceil(n/512) rows
    want_rows = sum(-(-(3000 + 500 * i) // 512) for i in range(5))
    assert len(wins) == want_rows
    assert set(wins.clip_id) == set(range(5))
