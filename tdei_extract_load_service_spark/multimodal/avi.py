"""Minimal stdlib AVI (RIFF) container codec for MJPEG video — the tier
that turns video frame-sampling from a byte-window stand-in into REAL
decoded frames.

Motion-JPEG is the one mainstream video codec whose frames are complete
baseline-JPEG images, so the stdlib JPEG decoder (multimodal/jpeg.py)
decodes every sampled frame for real: RIFF chunk walk -> 'movi' LIST ->
'00dc' compressed-frame chunks -> Huffman+IDCT pixels. Inter-frame
codecs (H.264/VP9/AV1 and their MP4/MKV containers) remain the declared
boundary — motion compensation genuinely needs a codec library.

The encoder is a fixture generator writing a structurally-valid minimal
AVI (RIFF 'AVI ' / hdrl with avih+strl / movi with one '00dc' chunk per
frame); the decoder parses any MJPEG AVI of that shape, including ones
with an idx1 index appended.
"""

from __future__ import annotations

import struct


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks are word-aligned
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Wrap complete JPEG images as the frames of a minimal MJPEG AVI."""
    if not frames:
        raise ValueError("at least one frame required")
    usec_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max(len(f) for f in frames)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            usec_per_frame, max_bytes * fps, 0, 0x10,  # HASINDEX-free flags
            len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
        ),
    )
    # AVISTREAMHEADER, all 56 bytes: fccType fccHandler dwFlags wPriority
    # wLanguage dwInitialFrames dwScale dwRate dwStart dwLength
    # dwSuggestedBufferSize dwQuality dwSampleSize rcFrame(RECT, 4x16-bit)
    strh = _chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps,
                      0, len(frames), max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height),
    )
    # BITMAPINFOHEADER
    strf = _chunk(
        b"strf",
        struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                    width * height * 3, 0, 0, 0, 0),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi_frames(blob: bytes) -> list[bytes]:
    """Extract the compressed frame payloads ('00dc'/'01dc' chunks inside
    the 'movi' LIST) of an AVI. Raises ValueError for non-AVI RIFF or a
    missing movi list."""
    data = bytes(blob)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/AVI ) container")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if tag == b"LIST":
                list_type = data[body_start : body_start + 4]
                if list_type in (b"movi", b"hdrl", b"rec "):
                    walk(body_start + 4, body_start + size)
            elif tag[2:4] == b"dc":  # 00dc, 01dc... compressed frames
                frames.append(data[body_start : body_start + size])
            pos = body_start + size + (size % 2)

    walk(12, len(data))
    if not frames:
        raise ValueError("no movi frame chunks found (needs a codec?)")
    return frames


def sample_frame_indices(n_total: int, n_sample: int) -> list[int]:
    """Evenly-spaced frame indices: k-th sample at floor(k*n_total/n_sample)
    — integer arithmetic, exactly reproducible in SQL oracles."""
    n_sample = min(max(n_sample, 1), n_total)
    return [(k * n_total) // n_sample for k in range(n_sample)]
