"""From-scratch AVI/RIFF video codec (stdlib struct + numpy).

Video enters the engine the same way images and audio do — an opaque
Arrow ``binary`` column with typed metadata, decoded by an actor-pool
stage (driver brief: multimodal columns with decode / frame-sample as
``map_batches`` stages).  AVI is a RIFF container (the same chunk
grammar as the WAV codec in functions/wavcodec.py); with uncompressed
DIB frames it is the video analogue of BMP: a real parser is public-
spec chunk walking, so the engine implements the container AND the raw
frame codec instead of stubbing.  Compressed essences (h264/vp9/...)
remain stubbed — no codec libs in this container.

Layout written/read (the canonical minimal AVI):

    RIFF <sz> 'AVI '
      LIST 'hdrl'
        'avih' MainAVIHeader   (frame period, counts, dimensions)
        LIST 'strl'
          'strh' AVIStreamHeader ('vids'/'DIB ', rate/scale -> fps)
          'strf' BITMAPINFOHEADER (24-bit, BI_RGB)
      LIST 'movi'
        '00db' <frame>  x N    (bottom-up BGR rows padded to 4 bytes,
                                exactly the BMP pixel-array layout)
      'idx1' <entries>         (one entry per frame)

The decoder tolerates extra chunks (JUNK, INFO LISTs), nested
``LIST rec`` groups around frame chunks, and both ``00db`` (uncompressed)
and ``00dc`` ids, per the published AVI spec.
"""

from __future__ import annotations

import struct

import numpy as np


def _pad4(n: int) -> int:
    return (n + 3) & ~3


def encode_avi(frames: np.ndarray, fps: int = 12) -> bytes:
    """Frames ``(n, h, w, 3)`` uint8 RGB -> AVI bytes with uncompressed
    24-bit DIB frames (bottom-up BGR rows, 4-byte-aligned)."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be (n, h, w, 3) uint8 RGB")
    n, h, w, _ = frames.shape
    if n == 0 or h == 0 or w == 0:
        raise ValueError("frames must be non-empty")
    stride = _pad4(w * 3)
    frame_size = stride * h

    # one DIB per frame: flip rows (bottom-up), RGB->BGR, pad rows
    padded = np.zeros((n, h, stride), np.uint8)
    padded[:, :, : w * 3] = frames[:, ::-1, :, ::-1].reshape(n, h, w * 3)
    dibs = [padded[i].tobytes() for i in range(n)]

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_size,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ",
        0, 0, 0, 0,
        1,  # dwScale
        fps,  # dwRate  (fps = rate / scale)
        0,  # dwStart
        n,  # dwLength
        frame_size, 0xFFFFFFFF & -1, 0,
        0, 0, np.int16(w), np.int16(h),
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) % 2))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    offsets = []
    for dib in dibs:
        offsets.append(len(movi_body))  # offset of ckid from 'movi' tag
        movi_body += chunk(b"00db", dib)
    movi = chunk(b"LIST", movi_body)

    idx = b"".join(
        struct.pack("<4sIII", b"00db", 0x10, off, frame_size) for off in offsets
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """AVI bytes -> ``(frames (n, h, w, 3) uint8 RGB, fps)``.  Walks the
    RIFF chunk tree per the spec; only uncompressed 24-bit DIB video
    streams are supported (compressed essences raise ``ValueError``)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")

    width = height = None
    bitcount = compression = None
    rate = scale = None
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height, bitcount, compression, rate, scale
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if cid == b"LIST":
                # list body = 4-byte kind + sub-chunks
                walk(body_start + 4, body_end)
            elif cid == b"strh":
                fcc_type, _fcc_handler = payload[body_start : body_start + 4], None
                if fcc_type == b"vids":
                    scale, rate = struct.unpack(
                        "<II", payload[body_start + 20 : body_start + 28]
                    )
            elif cid == b"strf" and width is None:
                (
                    _bisz, width, height, _planes, bitcount, compression,
                ) = struct.unpack("<IiiHHI", payload[body_start : body_start + 20])
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                frames.append(payload[body_start:body_end])
            pos = body_start + size + (size % 2)  # chunks are word-aligned

    walk(12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0]))

    if width is None or not frames:
        raise ValueError("AVI without video stream format / frame chunks")
    if compression != 0 or bitcount != 24:
        raise ValueError(
            f"only uncompressed 24-bit DIB frames supported "
            f"(biCompression={compression}, biBitCount={bitcount})"
        )
    top_down = height < 0
    h = abs(int(height))
    w = int(width)
    stride = _pad4(w * 3)
    out = np.empty((len(frames), h, w, 3), np.uint8)
    for i, dib in enumerate(frames):
        if len(dib) < stride * h:
            raise ValueError(f"frame {i}: {len(dib)} bytes < {stride * h} expected")
        rows = np.frombuffer(dib[: stride * h], np.uint8).reshape(h, stride)
        img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        out[i] = img if top_down else img[::-1]
    fps = (rate / scale) if (rate and scale) else 0.0
    return out, fps
