"""IMA ADPCM codec (functions/adpcmcodec.py) + WAV container routing.

Test strategy mirrors the other codec suites (jpeg/gif/webp): a scalar
per-sample reference implementation cross-checks the block-vectorized
decoder, plus round-trip, edge-case, and container tests.
"""

import numpy as np
import pytest

from tesseract_wasm_ray.functions.adpcmcodec import (
    INDEX_TABLE,
    STEP_TABLE,
    decode_adpcm_mono,
    encode_adpcm_mono,
    samples_per_block,
)
from tesseract_wasm_ray.functions.wavcodec import (
    decode_wav,
    encode_wav,
    encode_wav_adpcm,
)


def _decode_scalar(data: bytes, block_align: int) -> np.ndarray:
    """Per-sample reference decoder (one Python step per sample)."""
    spb = samples_per_block(block_align)
    out = []
    for b0 in range(0, len(data) // block_align * block_align, block_align):
        blk = data[b0 : b0 + block_align]
        pred = int.from_bytes(blk[0:2], "little", signed=True)
        index = min(max(blk[2], 0), 88)
        out.append(pred)
        nibbles = []
        for byte in blk[4:]:
            nibbles.append(byte & 0x0F)
            nibbles.append(byte >> 4)
        for nib in nibbles[: spb - 1]:
            step = int(STEP_TABLE[index])
            diff = step >> 3
            if nib & 4:
                diff += step
            if nib & 2:
                diff += step >> 1
            if nib & 1:
                diff += step >> 2
            pred = pred - diff if nib & 8 else pred + diff
            pred = min(max(pred, -32768), 32767)
            index = min(max(index + int(INDEX_TABLE[nib & 7]), 0), 88)
            out.append(pred)
    return np.array(out, np.int16)


def test_vectorized_decoder_matches_scalar_reference():
    rng = np.random.default_rng(3)
    sig = np.cumsum(rng.integers(-500, 501, 3000)).clip(-32000, 32000).astype(np.int16)
    for ba in (16, 64, 256):
        raw = encode_adpcm_mono(sig, ba)
        np.testing.assert_array_equal(
            decode_adpcm_mono(raw, ba), _decode_scalar(raw, ba)
        )


def test_dc_clip_roundtrips_exactly():
    for amp in (-32768, -100, 0, 77, 32767):
        s = np.full(999, amp, np.int16)
        got = decode_adpcm_mono(encode_adpcm_mono(s, 256), 256, n_samples=999)
        np.testing.assert_array_equal(got, s)


def test_decoded_signal_is_fixed_point_of_reencode():
    # any decoder output lies in the nibble-representable domain, so a
    # second encode/decode trip must reproduce it bit-for-bit
    rng = np.random.default_rng(11)
    sig = (rng.integers(-32768, 32768, 2048)).astype(np.int16)
    d1 = decode_adpcm_mono(encode_adpcm_mono(sig, 64), 64)
    d2 = decode_adpcm_mono(encode_adpcm_mono(d1, 64), 64)
    np.testing.assert_array_equal(d1, d2)


def test_tracking_error_bounded_on_smooth_signal():
    t = np.arange(8000)
    sig = (3000 * np.sin(t / 40.0)).astype(np.int16)
    out = decode_adpcm_mono(encode_adpcm_mono(sig), 256, n_samples=len(sig))
    err = np.abs(out.astype(np.int64) - sig.astype(np.int64))
    assert err.mean() < 50  # 4-bit ADPCM tracks a smooth signal closely


def test_padding_trimmed_by_fact_chunk():
    spb = samples_per_block(256)
    n = spb + 5  # forces a heavily padded second block
    sig = np.arange(n, dtype=np.int16)
    samples, rate = decode_wav(encode_wav_adpcm(sig, 16000))
    assert rate == 16000
    assert samples.shape == (n, 1)


def test_wav_container_roundtrip_and_format_tag():
    sig = np.full(500, 64, np.int16)
    payload = encode_wav_adpcm(sig, 8000)
    assert payload[:4] == b"RIFF" and b"fact" in payload[:60]
    out, rate = decode_wav(payload)
    np.testing.assert_array_equal(out[:, 0], sig)
    # PCM path still decodes alongside
    pcm, _ = decode_wav(encode_wav(sig, 8000))
    np.testing.assert_array_equal(pcm[:, 0], sig)


def test_errors():
    with pytest.raises(ValueError):
        encode_adpcm_mono(np.zeros((4, 2), np.int16))  # stereo
    with pytest.raises(ValueError):
        encode_adpcm_mono(np.zeros(0, np.int16))
    with pytest.raises(ValueError):
        samples_per_block(4)
    with pytest.raises(ValueError):
        decode_adpcm_mono(b"\x00" * 8, 256)  # shorter than one block
    with pytest.raises(ValueError):
        # fact chunk claiming more samples than the stream carries
        decode_adpcm_mono(encode_adpcm_mono(np.zeros(10, np.int16), 16), 16, 10**6)
    with pytest.raises(ValueError):
        encode_wav_adpcm(np.zeros(10, np.float32))  # wrong dtype


def test_batched_encode_decode_matches_per_clip():
    """encode_adpcm_many / decode_adpcm_many stack blocks from many
    clips through ONE recurrence; bytes and samples must be identical
    to the per-clip codecs for mixed lengths (including fact-trim of
    final-block padding)."""
    import numpy as np

    from tesseract_wasm_ray.functions.adpcmcodec import (
        decode_adpcm_many,
        decode_adpcm_mono,
        encode_adpcm_many,
        encode_adpcm_mono,
    )

    rng = np.random.default_rng(7)
    clips = [
        (rng.integers(-3000, 3000, size=n).astype(np.int16))
        for n in (121, 122, 500, 4000, 1)
    ]
    ba = 64
    many = encode_adpcm_many(clips, ba)
    singles = [encode_adpcm_mono(c, ba) for c in clips]
    assert many == singles

    lens = [len(c) for c in clips]
    dec_many = decode_adpcm_many(many, ba, lens)
    for d, blob, n in zip(dec_many, many, lens):
        np.testing.assert_array_equal(d, decode_adpcm_mono(blob, ba, n))


def test_batched_decode_validates_up_front():
    import numpy as np
    import pytest

    from tesseract_wasm_ray.functions.adpcmcodec import decode_adpcm_many, encode_adpcm_mono

    good = encode_adpcm_mono(np.zeros(121, np.int16), 64)
    with pytest.raises(ValueError):
        decode_adpcm_many([good, b"xx"], 64, [121, None])
    with pytest.raises(ValueError):
        decode_adpcm_many([good], 64, [10_000])
