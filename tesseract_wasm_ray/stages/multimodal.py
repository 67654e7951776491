"""Multimodal column stages: opaque ``binary`` payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with
(width, height, channels / sample_rate / fps) metadata, processed by
actor-pool ``map_batches`` stages.  Raw-raster operations (resize,
feature extraction, frame slicing) are REAL numpy implementations; the
compressed-codec decode step is STUBBED (no image/audio libs in this
container — driver brief): it raises ``NotImplementedError`` unless
``fake="deterministic"``, which produces a seeded synthetic raster so
the Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is fully exercised and tested.

Batch sizing: payload rows are wide; callers pass small ``batch_size``
(default 16 in :func:`decode_media`) so batch × concurrency fits a
worker heap (SURVEY.md §4.2).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
from ..functions.arrow_util import single_chunk as _single_chunk

RAW_CODECS = {"raw", "raw-rgba", "raw-gray"}
STUB_CODECS = {"jpeg", "png", "webp", "mp3", "wav", "h264"}





def _fake_raster(ref: str, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic stand-in decode: seeded gradient + noise raster."""
    rng = np.random.default_rng(zlib.crc32(ref.encode()))
    base = np.linspace(0, 255, width, dtype=np.float32)[None, :, None]
    img = np.broadcast_to(base, (height, width, channels)).copy()
    img += rng.normal(0, 8, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


class MediaDecodeActor:
    """Actor-pool decode stage: (media_ref, payload, codec, width,
    height, channels) -> raw ``pixels`` rows.

    ``__init__`` is the once-per-actor setup point (codec contexts /
    model handles at scale); ``__call__`` handles one Arrow batch.
    """

    def __init__(self, fake: str | None = None):
        # Real codec initialization would happen here (load libjpeg
        # contexts etc.) — once per actor, NOT per batch.
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = _single_chunk(batch.column("media_ref")).to_pylist()
        codecs = _single_chunk(batch.column("codec")).to_pylist()
        payloads = _single_chunk(batch.column("payload"))
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        channels = batch.column("channels").to_pylist()
        out = []
        for i, codec in enumerate(codecs):
            if codec in RAW_CODECS:
                out.append(payloads[i].as_py())
            elif codec in STUB_CODECS:
                if self.fake == "deterministic":
                    out.append(
                        _fake_raster(refs[i], widths[i], heights[i], channels[i]).tobytes()
                    )
                else:
                    # STUB: compressed-codec decode requires an image/audio
                    # library not present in this environment.
                    raise NotImplementedError(
                        f"decode of codec {codec!r} is stubbed in this environment; "
                        "pass fake='deterministic' to exercise the pipeline"
                    )
            else:
                raise ValueError(f"unknown codec {codec!r}")
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "channels": pa.array(channels, pa.int32()),
                "pixels": pa.array(out, pa.binary()),
            }
        )


def decode_media(ds, fake: str | None = None, concurrency: int = 4, batch_size: int = 16):
    """Wire the decode actor pool: small batches (wide rows), one CPU
    per actor."""
    return ds.map_batches(
        MediaDecodeActor,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def resize_nearest(batch: pa.Table, out_w: int, out_h: int) -> pa.Table:
    """Real nearest-neighbor resize of raw rasters (vectorized index
    gather per image; the per-image loop is over the batch's few wide
    rows, not corpus rows)."""
    pixels = _single_chunk(batch.column("pixels"))
    widths = batch.column("width").to_pylist()
    heights = batch.column("height").to_pylist()
    channels = batch.column("channels").to_pylist()
    out = []
    for i in range(batch.num_rows):
        w, h, c = widths[i], heights[i], channels[i]
        img = np.frombuffer(pixels[i].as_py(), dtype=np.uint8).reshape(h, w, c)
        ys = (np.arange(out_h) * h // out_h).astype(np.int64)
        xs = (np.arange(out_w) * w // out_w).astype(np.int64)
        out.append(img[ys][:, xs].tobytes())
    t = batch.drop_columns(["pixels", "width", "height"])
    return (
        t.append_column("width", pa.array([out_w] * batch.num_rows, pa.int32()))
        .append_column("height", pa.array([out_h] * batch.num_rows, pa.int32()))
        .append_column("pixels", pa.array(out, pa.binary()))
    )


def media_features(batch: pa.Table) -> pa.Table:
    """Real feature extraction over raw rasters: mean intensity, ink
    density (fraction of dark pixels), aspect ratio.

    All three are EXACT integer ratios evaluated with one IEEE division
    (intensity sums in int64; "dark" is ``r+g+b < 384`` — identically
    ``gray < 128``), so the values are bit-identical to an independent
    engine dividing the same integers (the DuckDB oracle does exactly
    that over fixture-time sums) — no float accumulation order or
    rounding-mode differences can enter."""
    pixels = _single_chunk(batch.column("pixels"))
    widths = batch.column("width").to_pylist()
    heights = batch.column("height").to_pylist()
    channels = batch.column("channels").to_pylist()
    mean_i, ink, aspect = [], [], []
    for i in range(batch.num_rows):
        w, h, c = widths[i], heights[i], channels[i]
        img = np.frombuffer(pixels[i].as_py(), dtype=np.uint8).reshape(h, w, c)
        if c >= 3:
            mean_sum = int(img[..., :3].sum(dtype=np.int64))
            mean_denom = 3 * h * w
            n_dark = int((img[..., :3].sum(axis=2, dtype=np.int32) < 384).sum())
        else:
            mean_sum = int(img[..., 0].sum(dtype=np.int64))
            mean_denom = h * w
            n_dark = int((img[..., 0] < 128).sum())
        mean_i.append(mean_sum / mean_denom)
        ink.append(n_dark / (h * w))
        aspect.append(w / h)
    return pa.table(
        {
            "media_ref": _single_chunk(batch.column("media_ref")),
            "mean_intensity": pa.array(mean_i, pa.float64()),
            "ink_density": pa.array(ink, pa.float64()),
            "aspect_ratio": pa.array(aspect, pa.float64()),
        }
    )


def sample_frames(batch: pa.Table, every_nth: int = 10) -> pa.Table:
    """Frame sampling for raw concatenated-frame video payloads
    (codec="raw": payload = n_frames × h × w × c bytes) — REAL slicing.
    Compressed video is part of the decode stub above."""
    pixels = _single_chunk(batch.column("payload"))
    widths = batch.column("width").to_pylist()
    heights = batch.column("height").to_pylist()
    channels = batch.column("channels").to_pylist()
    refs = _single_chunk(batch.column("media_ref")).to_pylist()
    rows = []
    for i in range(batch.num_rows):
        w, h, c = widths[i], heights[i], channels[i]
        frame_bytes = w * h * c
        buf = pixels[i].as_py()
        n_frames = len(buf) // frame_bytes
        for f in range(0, n_frames, every_nth):
            rows.append(
                {
                    "media_ref": refs[i],
                    "frame_index": f,
                    "width": w,
                    "height": h,
                    "channels": c,
                    "pixels": buf[f * frame_bytes : (f + 1) * frame_bytes],
                }
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("media_ref", pa.string()),
                ("frame_index", pa.int32()),
                ("width", pa.int32()),
                ("height", pa.int32()),
                ("channels", pa.int32()),
                ("pixels", pa.binary()),
            ]
        ),
    )
