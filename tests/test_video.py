"""AVI/RIFF video codec (functions/avicodec.py) and the frame-sampling
actor stage."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from tesseract_wasm_ray.functions.avicodec import decode_avi, encode_avi


def test_roundtrip_exact():
    rng = np.random.default_rng(7)
    f = rng.integers(0, 256, (3, 9, 13, 3), dtype=np.uint8)
    dec, fps = decode_avi(encode_avi(f, fps=24))
    assert fps == 24.0
    assert np.array_equal(dec, f)


def test_roundtrip_row_padding_widths():
    # stride padding kicks in whenever w*3 % 4 != 0 — sweep all classes
    rng = np.random.default_rng(8)
    for w in (1, 2, 3, 4, 5):
        f = rng.integers(0, 256, (2, 4, w, 3), dtype=np.uint8)
        dec, _ = decode_avi(encode_avi(f))
        assert np.array_equal(dec, f), w


def test_tolerates_junk_and_rec_list():
    f = np.full((2, 4, 4, 3), 99, np.uint8)
    raw = encode_avi(f)
    # splice a JUNK chunk right after the AVI fourcc
    junk = b"JUNK" + (6).to_bytes(4, "little") + b"abcdef"
    patched = raw[:12] + junk + raw[12:]
    patched = patched[:4] + (len(patched) - 8).to_bytes(4, "little") + patched[8:]
    dec, _ = decode_avi(patched)
    assert np.array_equal(dec, f)


def test_rejects_garbage_and_compressed():
    with pytest.raises(ValueError):
        decode_avi(b"not an avi at all")
    with pytest.raises(ValueError):
        decode_avi(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")
    # flip biCompression to a nonzero codec tag -> must refuse loudly
    raw = bytearray(encode_avi(np.zeros((1, 2, 2, 3), np.uint8)))
    at = bytes(raw).find(b"strf") + 8  # strf body = BITMAPINFOHEADER
    raw[at + 16 : at + 20] = (875967048).to_bytes(4, "little")  # 'H264'
    with pytest.raises(ValueError):
        decode_avi(bytes(raw))
    with pytest.raises(ValueError):
        encode_avi(np.zeros((2, 2, 2), np.uint8))  # missing channel dim


def test_mjpeg_solid_frames_roundtrip_exact():
    """MJPEG essence: solid-color frames survive the JPEG q100/4:4:4
    round-trip bit-exactly (DC-only blocks, all-ones quant tables) —
    the property the closed-form video_frames oracle relies on."""
    vals = np.array([0, 7, 128, 201, 255], np.uint8)
    f = np.broadcast_to(vals[:, None, None, None], (5, 16, 24, 3)).copy()
    raw = encode_avi(f, fps=12, codec="mjpg")
    assert b"MJPG" in raw[:200]  # compressed essence advertised
    dec, fps = decode_avi(raw)
    assert fps == 12.0
    assert np.array_equal(dec, f)
    # a compressed stream is NOT the DIB layout: frames are smaller
    assert len(raw) < len(encode_avi(f, fps=12, codec="dib"))


def test_mjpeg_textured_frames_lossy_but_close():
    rng = np.random.default_rng(5)
    f = rng.integers(60, 196, (2, 16, 16, 3), dtype=np.uint8)
    dec, _ = decode_avi(encode_avi(f, codec="mjpg"))
    assert dec.shape == f.shape
    err = np.abs(dec.astype(np.int16) - f.astype(np.int16))
    assert err.mean() < 4 and err.max() <= 32  # q100 is nearly lossless


def test_encode_avi_rejects_unknown_codec():
    with pytest.raises(ValueError, match="codec"):
        encode_avi(np.zeros((1, 2, 2, 3), np.uint8), codec="h264")


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 4),
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    seed=st.integers(0, 2**16),
)
def test_roundtrip_property(n, h, w, seed):
    f = np.random.default_rng(seed).integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    dec, fps = decode_avi(encode_avi(f, fps=12))
    assert fps == 12.0
    assert np.array_equal(dec, f)


def test_video_frames_actor_stage(ray_session):
    from tesseract_wasm_ray.stages.multimodal import video_frames

    rng = np.random.default_rng(5)
    clips = [rng.integers(0, 256, (5, 6, 6, 3), dtype=np.uint8) for _ in range(3)]
    ds = rd.from_arrow(
        pa.table(
            {
                "media_ref": pa.array(["a", "b", "c"]),
                "payload": pa.array([encode_avi(c) for c in clips], pa.binary()),
            }
        )
    )
    out = video_frames(ds, stride=2, concurrency=2, batch_size=2).to_pandas()
    # 5 frames, stride 2 -> sampled frames 0, 2, 4 per clip
    assert len(out) == 9
    assert sorted(out["frame_idx"].unique()) == [0, 2, 4]
    row = out[(out.media_ref == "b") & (out.frame_idx == 2)].iloc[0]
    assert row["n_frames"] == 5 and row["width"] == 6 and row["height"] == 6
    assert row["mean_val"] == pytest.approx(clips[1][2].mean())


def test_video_frames_emit_pixels(ray_session):
    from tesseract_wasm_ray.stages.multimodal import video_frames

    clip = np.random.default_rng(6).integers(0, 256, (4, 3, 5, 3), dtype=np.uint8)
    ds = rd.from_arrow(
        pa.table(
            {
                "media_ref": pa.array(["v"]),
                "payload": pa.array([encode_avi(clip)], pa.binary()),
            }
        )
    )
    out = (
        video_frames(ds, stride=3, emit_pixels=True, concurrency=1, batch_size=1)
        .to_pandas()
        .set_index("frame_idx")
    )
    assert sorted(out.index) == [0, 3]
    assert bytes(out.loc[3, "pixels"]) == clip[3].tobytes()


def test_video_frames_quarantine(ray_session):
    from tesseract_wasm_ray.stages.multimodal import video_frames

    clip = np.zeros((4, 4, 4, 3), dtype=np.uint8)
    ds = rd.from_arrow(
        pa.table(
            {
                "media_ref": pa.array(["good", "poison"]),
                "payload": pa.array(
                    [encode_avi(clip), b"RIFFgarbage"], pa.binary()
                ),
            }
        )
    )
    with pytest.raises(Exception):
        video_frames(ds, stride=2, concurrency=1).to_pandas()
    out = video_frames(
        ds, stride=2, concurrency=1, on_error="quarantine"
    ).to_pandas()
    bad = out[out.media_ref == "poison"]
    assert len(bad) == 1 and bad.iloc[0]["frame_idx"] == -1 and bad.iloc[0]["error"]
    ok = out[out.media_ref == "good"]
    assert list(ok["frame_idx"]) == [0, 2] and ok["error"].isna().all()
