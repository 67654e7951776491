"""WAV/RIFF PCM codec (functions/wavcodec.py) and the audio
feature actor stage."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from tesseract_wasm_ray.functions.wavcodec import decode_wav, encode_wav


def test_roundtrip_mono_16bit():
    s = (np.sin(np.arange(500) / 7) * 12000).astype(np.int16)
    arr, rate = decode_wav(encode_wav(s, 22050))
    assert rate == 22050
    assert arr.shape == (500, 1)
    assert np.array_equal(arr[:, 0], s)


def test_roundtrip_stereo_and_8bit():
    st = np.stack([np.arange(33), 255 - np.arange(33)], 1).astype(np.int16)
    arr, _ = decode_wav(encode_wav(st, 8000))
    assert np.array_equal(arr, st)
    u8 = (np.arange(7) * 30 % 256).astype(np.uint8)
    arr8, _ = decode_wav(encode_wav(u8, 16000))
    assert arr8.dtype == np.uint8 and np.array_equal(arr8[:, 0], u8)


def test_tolerates_extra_chunks_and_word_alignment():
    s = np.array([100, -100, 50], np.int16)  # odd data size in 8-bit? 16-bit: 6 bytes
    raw = bytearray(encode_wav(s, 8000))
    # splice a LIST chunk between fmt and data
    data_at = bytes(raw).find(b"data")
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    patched = bytes(raw[:data_at]) + extra + bytes(raw[data_at:])
    patched = patched[:4] + (len(patched) - 8).to_bytes(4, "little") + patched[8:]
    arr, rate = decode_wav(patched)
    assert np.array_equal(arr[:, 0], s)
    # odd-sized 8-bit data chunk exercises the pad byte
    u8 = np.array([1, 2, 3], np.uint8)
    arr8, _ = decode_wav(encode_wav(u8, 8000))
    assert np.array_equal(arr8[:, 0], u8)


def test_rejects_malformed():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")
    with pytest.raises(ValueError, match="fmt/data"):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")
    s = np.array([1], np.int16)
    raw = bytearray(encode_wav(s, 8000))
    fmt_at = bytes(raw).find(b"fmt ")
    raw[fmt_at + 8] = 3  # format tag -> IEEE float
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(raw))
    with pytest.raises(ValueError, match="dtype"):
        encode_wav(np.zeros(4, np.float32))


def test_audio_feature_actor(ray_session):
    from tesseract_wasm_ray.stages.multimodal import audio_features

    amp = 321
    wave = ((np.arange(1000) % 2) * 2 - 1).astype(np.int16) * np.int16(amp)
    t = pa.table(
        {
            "media_ref": pa.array(["a1"], pa.string()),
            "payload": pa.array([encode_wav(wave, 8000)], pa.binary()),
        }
    )
    out = audio_features(rd.from_arrow(t), concurrency=1).to_pandas()
    row = out.iloc[0]
    assert (row["sample_rate"], row["n_samples"], row["n_channels"]) == (8000, 1000, 1)
    assert row["rms"] == float(amp) and row["peak"] == amp


def test_audio_feature_actor_quarantine(ray_session):
    from tesseract_wasm_ray.stages.multimodal import audio_features

    good = encode_wav(np.full(100, 7, np.int16), 8000)
    t = pa.table(
        {
            "media_ref": pa.array(["ok", "bad", "ok2"], pa.string()),
            "payload": pa.array([good, b"not a wav at all", good], pa.binary()),
        }
    )
    # default raises on the corrupt clip
    import pytest as _pytest

    with _pytest.raises(Exception):
        audio_features(rd.from_arrow(t), concurrency=1).to_pandas()
    # quarantine mode: one error row, clean rows unaffected
    out = (
        audio_features(rd.from_arrow(t), concurrency=1, on_error="quarantine")
        .to_pandas()
        .set_index("media_ref")
    )
    assert out.loc["bad", "error"] and out.loc["bad", "n_samples"] == 0
    assert out.loc["ok", "error"] is None and out.loc["ok", "rms"] == 7.0
    assert out.loc["ok2", "peak"] == 7
