"""Minimal AVI (RIFF) container codec for MJPEG video -- pure stdlib.

With baseline JPEG real (multimodal/jpeg.py), the video modality no
longer needs a fake for non-GIF containers: MJPEG-in-AVI is JPEG frames
in RIFF chunks, and RIFF is pure byte walking (the same class of work
as the GIF block walk in decode.parse_gif_frames).

  encode_avi_mjpeg: RIFF('AVI ') <- LIST(hdrl: avih + strl(strh/strf))
    + LIST(movi: one '00dc' chunk per encode_jpeg frame). Chunks are
    word-aligned per the RIFF rules.

  parse_avi_frames: verifies the RIFF/AVI signature, reads dims +
    frame timing from avih, walks the movi list recording every video
    frame's offset/size, and (lazily, via decode=True) decodes frame
    pixels with parse_jpeg_pixels. Returns None for non-AVI bytes so
    callers can fall through exactly like the other parsers.

Reference behavior note: the migration tool reads attachment bytes and
sniffs MIME (TicketProcessor.php:295-298); video sampling is this
repo's LLM-pipeline extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import encode_jpeg, parse_jpeg_pixels


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """(h, w, 3) BGR uint8 frames -> minimal MJPEG AVI bytes."""
    if not frames:
        raise ValueError("encode_avi_mjpeg: need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f) for f in frames]
    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    # fccType fccHandler flags priority language initialFrames scale
    # rate start length suggestedBufferSize quality sampleSize rcFrame
    strh = struct.pack(
        "<4s4sI2H8I4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0,
        0, 0, 0, 0,
    )
    # BITMAPINFOHEADER
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def parse_avi_frames(b: bytes, decode: bool = False) -> dict | None:
    """AVI bytes -> {width, height, us_per_frame, n_frames, frames:
    [{offset, size, pixels?}]} or None if not an AVI."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    try:
        return _walk(b, decode)
    except (struct.error, IndexError, ValueError):
        return None


def _walk(b: bytes, decode: bool) -> dict | None:
    width = height = us_per_frame = n_declared = 0
    frames: list[dict] = []

    def walk_list(start: int, end: int) -> None:
        nonlocal width, height, us_per_frame, n_declared
        pos = start
        while pos + 8 <= end:
            fourcc = b[pos : pos + 4]
            size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
            body = pos + 8
            if fourcc == b"LIST":
                walk_list(body + 4, body + size)
            elif fourcc == b"avih":
                (us_per_frame, _, _, _, n_declared, _, _, _, width, height) = (
                    struct.unpack("<10I", b[body : body + 40])
                )
            elif fourcc[2:4] in (b"dc", b"db"):  # compressed/raw video frame
                frame: dict = {"offset": body, "size": size}
                if decode:
                    parsed = parse_jpeg_pixels(b[body : body + size])
                    frame["pixels"] = None if parsed is None else parsed[2]
                frames.append(frame)
            pos = body + size + (size % 2)  # word alignment

    walk_list(12, len(b))
    if not width or not frames:
        return None
    return {
        "width": width,
        "height": height,
        "us_per_frame": us_per_frame,
        "n_frames": len(frames),
        "frames": frames,
    }
