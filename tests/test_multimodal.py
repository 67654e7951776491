"""Multimodal stages: raw-path decode, stubbed codec decode, resize,
features, frame sampling — plumbing is real even where decode is faked."""

import numpy as np
import pyarrow as pa
import pytest

from tesseract_wasm_ray.stages.multimodal import (
    MediaDecodeActor,
    media_features,
    resize_nearest,
    sample_frames,
)


def _raw_batch():
    img = np.arange(2 * 3 * 1, dtype=np.uint8).reshape(2, 3, 1)
    return pa.Table.from_pylist(
        [
            {
                "media_ref": "m-raw",
                "payload": img.tobytes(),
                "codec": "raw",
                "width": 3,
                "height": 2,
                "channels": 1,
            },
            {
                "media_ref": "m-jpg",
                "payload": b"\xff\xd8fakejpeg",
                "codec": "jpeg",
                "width": 4,
                "height": 4,
                "channels": 4,
            },
        ]
    )


def test_decode_raw_passthrough_and_fake_codec():
    out = MediaDecodeActor(fake="deterministic")(_raw_batch())
    assert out.column_names == ["media_ref", "width", "height", "channels", "pixels"]
    pix = out.column("pixels").to_pylist()
    assert pix[0] == bytes(range(6))  # raw path: exact passthrough
    assert len(pix[1]) == 4 * 4 * 4  # fake decode: right-sized raster
    # Deterministic: same ref -> same bytes
    again = MediaDecodeActor(fake="deterministic")(_raw_batch())
    assert again.column("pixels").to_pylist()[1] == pix[1]


def test_decode_codec_without_fake_raises_stub():
    with pytest.raises(NotImplementedError, match="stubbed"):
        MediaDecodeActor()(_raw_batch())


def test_decode_unknown_codec_rejected():
    bad = pa.Table.from_pylist(
        [{"media_ref": "x", "payload": b"", "codec": "tiff9", "width": 1, "height": 1, "channels": 1}]
    )
    with pytest.raises(ValueError, match="unknown codec"):
        MediaDecodeActor(fake="deterministic")(bad)


def test_resize_nearest_geometry():
    img = np.arange(4 * 4, dtype=np.uint8).reshape(4, 4, 1)
    b = pa.Table.from_pylist(
        [{"media_ref": "r", "channels": 1, "width": 4, "height": 4, "pixels": img.tobytes()}]
    )
    out = resize_nearest(b, 2, 2)
    got = np.frombuffer(out.column("pixels")[0].as_py(), np.uint8).reshape(2, 2)
    np.testing.assert_array_equal(got, img[::2, ::2, 0])
    assert out.column("width").to_pylist() == [2]


def test_media_features_values():
    img = np.zeros((2, 2, 1), np.uint8)
    img[0, 0] = 255
    b = pa.Table.from_pylist(
        [{"media_ref": "f", "channels": 1, "width": 2, "height": 2, "pixels": img.tobytes()}]
    )
    out = media_features(b).to_pylist()[0]
    assert out["mean_intensity"] == pytest.approx(255 / 4)
    assert out["ink_density"] == pytest.approx(3 / 4)
    assert out["aspect_ratio"] == 1.0


def test_sample_frames_raw_video():
    frame = np.zeros((2, 2, 1), np.uint8)
    video = b"".join(bytes([i]) * 4 for i in range(25))  # 25 frames of 4 bytes
    b = pa.Table.from_pylist(
        [{"media_ref": "v", "payload": video, "codec": "raw", "width": 2, "height": 2, "channels": 1}]
    )
    out = sample_frames(b, every_nth=10)
    assert out.column("frame_index").to_pylist() == [0, 10, 20]
    assert out.column("pixels").to_pylist()[1] == bytes([10]) * 4


def test_decode_actor_pool_pipeline(ray_session):
    """Actor-pool wiring end-to-end over a small media dataset."""
    import ray.data as rd

    from tesseract_wasm_ray.stages.multimodal import decode_media

    rows = []
    for i in range(20):
        rows.append(
            {
                "media_ref": f"m{i:03d}",
                "payload": bytes(range(12)) if i % 2 == 0 else b"x",
                "codec": "raw" if i % 2 == 0 else "png",
                "width": 4 if i % 2 == 0 else 2,
                "height": 3 if i % 2 == 0 else 2,
                "channels": 1,
            }
        )
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = decode_media(ds, fake="deterministic", concurrency=2, batch_size=4).to_pandas()
    assert len(out) == 20
    assert all(
        len(p) == w * h * c
        for p, w, h, c in zip(out["pixels"], out["width"], out["height"], out["channels"])
    )
