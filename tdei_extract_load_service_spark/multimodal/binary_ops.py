"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata (north-star extension).

Design: the *Spark-side plumbing* — schemas, Arrow batch shapes, UDF
signatures, partitioning — is real and tested; the codec step is stubbed
behind an import-try (the image/audio libraries are not in this container).
``decode_image`` raises ``NotImplementedError`` per-row into an ``error``
column (never fails the job) unless Pillow is importable, in which case the
real decode runs through the identical plumbing.

Scale notes: binary payloads ride ``mapInPandas`` (Arrow-batched, columnar
transfer); metadata extraction is pure JVM functions. Decoded/derived
frames should be written ``partitionBy`` on coarse keys (format, shard) —
never on high-cardinality media ids.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: magic-number sniffing table (prefix hex -> format label)
MAGIC_NUMBERS: tuple[tuple[str, str], ...] = (
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi/webp container
    ("494433", "mp3"),
    ("664C6143", "flac"),
    ("1A45DFA3", "matroska"),  # mkv/webm
    ("00000018667479", "mp4"),
    ("00000020667479", "mp4"),
)

#: schema of the decoded-image output (the UDF contract)
DECODE_SCHEMA = (
    "media_id bigint, format string, width int, height int, n_channels int, "
    "decoded boolean, error string"
)

FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_idx int, frame_hash string, n_bytes int"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def binary_meta(content: str | Column) -> Column:
    """Typed metadata struct over an opaque binary column — JVM-side:
    byte length, sha2 content hash, magic-number format sniff."""
    c = _col(content)
    hex_prefix = F.upper(F.hex(F.substring(c, 1, 16)))
    fmt = F.lit("unknown")
    for magic, label in reversed(MAGIC_NUMBERS):
        fmt = F.when(hex_prefix.startswith(magic), label).otherwise(fmt)
    return F.struct(
        F.length(c).alias("n_bytes"),
        F.sha2(c, 256).alias("sha256"),
        fmt.alias("format"),
    )


def parse_image_header(blob: bytes) -> dict | None:
    """Pure-stdlib dimension/channel parse of the public image container
    headers — PNG IHDR chunk, GIF logical-screen descriptor, JPEG SOFn
    frame segment. A *real* byte-level decode of real image bytes (no
    codec library), used as the decode tier below Pillow; returns None for
    formats whose pixel metadata genuinely needs a codec."""
    import struct

    if len(blob) >= 26 and blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[12:16] == b"IHDR":
        w, h = struct.unpack(">II", bytes(blob[16:24]))
        color_type = blob[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        return {"format": "png", "width": w, "height": h, "n_channels": channels}
    if len(blob) >= 10 and bytes(blob[:6]) in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", bytes(blob[6:10]))
        return {"format": "gif", "width": w, "height": h, "n_channels": 3}
    if len(blob) >= 4 and bytes(blob[:3]) == b"\xff\xd8\xff":
        sof_markers = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                       0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
        i = 2
        while i + 9 < len(blob) and blob[i] == 0xFF:
            marker = blob[i + 1]
            if marker in sof_markers:
                h, w = struct.unpack(">HH", bytes(blob[i + 5 : i + 9]))
                return {"format": "jpeg", "width": w, "height": h,
                        "n_channels": blob[i + 9]}
            seglen = struct.unpack(">H", bytes(blob[i + 2 : i + 4]))[0]
            i += 2 + seglen
    return None


def decode_image(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Decode images to (format, width, height, channels) through
    ``mapInPandas``.

    Decode tiers: (1) Pillow when importable — full decode; (2) the
    pure-stdlib container-header parse (``parse_image_header``) for
    PNG/GIF/JPEG — real dimensions/channels from real bytes;
    (3) STUB BOUNDARY — other formats without Pillow report
    ``decoded=false, error='NotImplementedError: ...'`` per row. All three
    tiers share the same Arrow plumbing, batch iteration and output schema.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        import io

        for pdf in batches:
            out = {k: [] for k in ("media_id", "format", "width", "height", "n_channels", "decoded", "error")}
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                rec = dict(media_id=mid, format=None, width=None, height=None,
                           n_channels=None, decoded=False, error=None)
                if have_pil:
                    try:
                        img = Image.open(io.BytesIO(blob))
                        rec.update(format=img.format.lower() if img.format else None,
                                   width=img.width, height=img.height,
                                   n_channels=len(img.getbands()), decoded=True)
                    except Exception as exc:  # noqa: BLE001
                        rec["error"] = f"{type(exc).__name__}: {exc}"
                else:
                    header = parse_image_header(blob)
                    if header is not None:
                        rec.update(decoded=True, **header)
                    else:
                        rec["error"] = (
                            "NotImplementedError: full image decode requires "
                            "Pillow (not installed in this environment)"
                        )
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(decode, schema=DECODE_SCHEMA)


DECODE_PIXELS_SCHEMA = (
    "media_id bigint, width int, height int, n_channels int, "
    "pixel_checksum bigint, decoded boolean, error string"
)

_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal stdlib PNG encoder (8-bit, color type 2=RGB or 6=RGBA).

    Deliberately rotates the scanline filter (y % 5: None/Sub/Up/Average/
    Paeth) so a decoder must implement every unfilter correctly to
    round-trip pixels — this is the fixture generator for the decode tier,
    not a general-purpose encoder."""
    import struct
    import zlib

    color_type = {3: 2, 4: 6}[channels]
    stride = width * channels
    assert len(pixels) == stride * height
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        f = y % 5
        raw.append(f)
        if f == 0:
            raw += line
        elif f == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - channels] if i >= channels else 0)) % 256
                for i in range(stride)
            )
        elif f == 2:  # Up
            raw += bytes((line[i] - prev[i]) % 256 for i in range(stride))
        elif f == 3:  # Average
            raw += bytes(
                (line[i] - (((line[i - channels] if i >= channels else 0) + prev[i]) // 2)) % 256
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                % 256
                for i in range(stride)
            )
        prev = line

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png_pixels(blob: bytes) -> dict:
    """Real stdlib PNG pixel decode: chunk walk -> zlib inflate of the
    concatenated IDAT stream -> per-scanline unfilter (all five PNG filter
    types). Supports 8-bit depth, color types 0/2/4/6, non-interlaced;
    palette (type 3) and interlaced images still need a codec and raise
    ``ValueError`` (caught into the error column by the operator).

    Returns {width, height, n_channels, pixels: bytes}."""
    import struct
    import zlib

    if bytes(blob[:8]) != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", bytes(blob[pos : pos + 4]))
        tag = bytes(blob[pos + 4 : pos + 8])
        body = bytes(blob[pos + 8 : pos + 8 + length])
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS_BY_COLOR_TYPE:
                raise ValueError(f"unsupported color type {color_type} (palette needs a codec)")
            if interlace != 0:
                raise ValueError("interlaced PNG needs a codec")
            channels = _CHANNELS_BY_COLOR_TYPE[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) % 256
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) % 256
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) % 256
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                upleft = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) % 256
        elif f != 0:
            raise ValueError(f"bad filter byte {f}")
        prev = bytes(line)
        out += line
    return {"width": width, "height": height, "n_channels": channels, "pixels": bytes(out)}


def pixel_checksum(pixels: bytes) -> int:
    """Position-weighted pixel checksum: sum(byte[i] * (i+1)). Chosen
    because it is closed-form computable in plain SQL for deterministic
    fixtures, making the zlib+unfilter round-trip oracle-checkable."""
    return sum(b * (i + 1) for i, b in enumerate(pixels))


def synth_png(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic PNG fixture generator over an id column (the sandbox
    testdata ships no real media): pixel byte i of image ``mid`` is
    ``(mid*7 + i) % 256``; width ``8 + mid%8``, height ``8 + mid%5``,
    RGB/RGBA alternating by parity. Runs as an Arrow-batched mapInPandas —
    the same plumbing a real media-ingest UDF uses."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h, c = 8 + mid % 8, 8 + mid % 5, 3 + mid % 2
                px = bytes((mid * 7 + i) % 256 for i in range(w * h * c))
                ids.append(mid)
                blobs.append(encode_png(w, h, c, px))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return df.select(id_col).mapInPandas(gen, schema="media_id bigint, content binary")


def synth_jpeg(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic baseline-JPEG fixture generator over an id column:
    16x16 grayscale, four 8x8 blocks, block b of image ``mid`` carrying
    only a DC coefficient ``((mid*7 + b*13) % 128) - 64``. DC-only blocks
    decode to flat tiles of exactly ``2*dc + 128`` under any correct IDCT
    (multimodal/jpeg.py), which is what gives this LOSSY format a
    closed-form SQL oracle — while the decoder still runs the full real
    path (Huffman, DC prediction, dequant, IDCT)."""
    from tdei_extract_load_service_spark.multimodal.jpeg import encode_jpeg_gray_blocks

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                dcs = [((mid * 7 + b * 13) % 128) - 64 for b in range(4)]
                ids.append(mid)
                blobs.append(encode_jpeg_gray_blocks(16, 16, dcs))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return df.select(id_col).mapInPandas(gen, schema="media_id bigint, content binary")


def decode_any_image(blob) -> dict:
    """THE codec dispatch: sniff the magic number and run the matching
    stdlib pixel decoder (PNG inflate+unfilter or baseline-JPEG
    Huffman+IDCT). One shared entry point so every operator (decode,
    resize, future tiers) sniffs and dispatches identically. Raises
    ValueError for codec-requiring inputs — callers catch per row."""
    if bytes(blob[:3]) == b"\xff\xd8\xff":
        from tdei_extract_load_service_spark.multimodal.jpeg import decode_jpeg_pixels

        return decode_jpeg_pixels(blob)
    return decode_png_pixels(blob)


def decode_image_pixels(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Full pixel decode of image binary columns through ``mapInPandas``
    (Arrow-batched), dispatching on the magic number: PNG via stdlib
    inflate + unfilter, baseline JPEG via the stdlib Huffman + IDCT
    decoder (multimodal/jpeg.py). Emits dimensions, channel count and a
    position-weighted pixel checksum. Codec-requiring inputs (palette or
    interlaced PNG, progressive or subsampled JPEG, other formats) land in
    the ``error`` column per row — the job never fails."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "media_id",
                    "width",
                    "height",
                    "n_channels",
                    "pixel_checksum",
                    "decoded",
                    "error",
                )
            }
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                rec = dict(
                    media_id=int(mid), width=None, height=None, n_channels=None,
                    pixel_checksum=None, decoded=False, error=None,
                )
                try:
                    d = decode_any_image(blob)
                    rec.update(
                        width=d["width"], height=d["height"],
                        n_channels=d["n_channels"],
                        pixel_checksum=pixel_checksum(d["pixels"]), decoded=True,
                    )
                except Exception as exc:  # noqa: BLE001
                    rec["error"] = f"{type(exc).__name__}: {exc}"
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(decode, schema=DECODE_PIXELS_SCHEMA)


RESIZE_SCHEMA = (
    "media_id bigint, src_width int, src_height int, width int, height int, "
    "n_channels int, pixel_checksum bigint, decoded boolean, error string"
)


def resize_image_pixels(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode (PNG or baseline JPEG, stdlib tiers) then nearest-neighbor
    resize to ``out_w x out_h`` — the thumbnail/normalize step every media
    ingest runs before feature extraction. Emits the resized image's
    position-weighted pixel checksum so the whole decode->resize chain is
    value-verifiable (with the DC-only JPEG fixtures it has a closed-form
    SQL oracle). Arrow-batched ``mapInPandas``; per-row failures land in
    ``error``, the job never fails.

    Nearest-neighbor (source pixel ``(floor(y*sh/oh), floor(x*sw/ow))``)
    is chosen over bilinear deliberately: it is exactly reproducible in
    integer arithmetic across engines, which is what makes the chain
    oracle-checkable — bilinear is a one-line swap where last-ulp float
    divergence is acceptable."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "media_id", "src_width", "src_height", "width", "height",
                    "n_channels", "pixel_checksum", "decoded", "error",
                )
            }
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                rec = dict(
                    media_id=int(mid), src_width=None, src_height=None,
                    width=out_w, height=out_h, n_channels=None,
                    pixel_checksum=None, decoded=False, error=None,
                )
                try:
                    d = decode_any_image(blob)
                    sw, sh, c = d["width"], d["height"], d["n_channels"]
                    px = d["pixels"]
                    resized = bytearray(out_w * out_h * c)
                    for y in range(out_h):
                        sy = (y * sh) // out_h
                        row = sy * sw * c
                        orow = y * out_w * c
                        for x in range(out_w):
                            sx = (x * sw) // out_w
                            resized[orow + x * c : orow + (x + 1) * c] = px[
                                row + sx * c : row + (sx + 1) * c
                            ]
                    rec.update(
                        src_width=sw, src_height=sh, n_channels=c,
                        pixel_checksum=pixel_checksum(bytes(resized)), decoded=True,
                    )
                except Exception as exc:  # noqa: BLE001
                    rec["error"] = f"{type(exc).__name__}: {exc}"
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(resize, schema=RESIZE_SCHEMA)


AHASH_SCHEMA = "media_id bigint, ahash bigint, decoded boolean, error string"


def image_ahash(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    grid: int = 8,
) -> DataFrame:
    """Perceptual AVERAGE HASH over the real decode path — the classic
    image near-dup fingerprint (aHash): decode (PNG inflate+unfilter or
    baseline JPEG, the stdlib tiers) -> integer grayscale (channel mean
    with floor division) -> nearest-neighbor sample to ``grid x grid``
    -> one bit per cell, set iff ``n_cells * pixel > sum(pixels)`` (the
    strictly-greater-than-mean test done in EXACT integers — no float
    mean, so the hash is bit-reproducible on any engine, which is what
    lets the catalog ORACLE restate it in closed form over the
    deterministic fixtures). Bits pack MSB-first (cell (0,0) is bit 63
    for the default 8x8 grid) into a two's-complement BIGINT so the
    downstream Hamming distance is one ``bit_count(a ^ b)``.

    Arrow-batched ``mapInPandas``; per-row codec failures land in
    ``error`` (ahash NULL), the job never fails. Feed the result to
    ``operators.dedup.hamming_hash_pairs`` for blocked near-dup pairs
    — the image-side twin of the text SimHash pipeline."""
    if not 1 <= grid * grid <= 64:
        # the hash packs one bit per cell into ONE bigint; grid > 8
        # would silently truncate bits off the top
        raise ValueError("grid*grid must be <= 64 (one bit per cell)")
    n_cells = grid * grid

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "ahash", "decoded", "error")}
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                rec = dict(
                    media_id=int(mid), ahash=None, decoded=False, error=None
                )
                try:
                    d = decode_any_image(blob)
                    sw, sh, c = d["width"], d["height"], d["n_channels"]
                    px = d["pixels"]
                    cells = []
                    for y in range(grid):
                        sy = (y * sh) // grid
                        for x in range(grid):
                            sx = (x * sw) // grid
                            base = (sy * sw + sx) * c
                            cells.append(
                                sum(px[base + ch] for ch in range(c)) // c
                            )
                    total = sum(cells)
                    h = 0
                    for v in cells:
                        h = (h << 1) | (1 if n_cells * v > total else 0)
                    if h >= 1 << 63:  # two's-complement BIGINT
                        h -= 1 << 64
                    rec.update(ahash=h, decoded=True)
                except Exception as exc:  # noqa: BLE001
                    rec["error"] = f"{type(exc).__name__}: {exc}"
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(ahash, schema=AHASH_SCHEMA)


EHASH_SCHEMA = "media_id bigint, ehash bigint, decoded boolean, error string"


def audio_envelope_hash(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    windows: int = 64,
) -> DataFrame:
    """Energy-envelope fingerprint over the real WAV decode path — the
    AUDIO twin of ``image_ahash``: decode (stdlib RIFF/PCM16 walk) ->
    channel-0 absolute amplitudes -> ``windows`` equal time windows ->
    one bit per window, set iff the window's MEAN absolute amplitude
    strictly exceeds the clip's (the comparison cross-multiplied in
    EXACT integers — ``e_j * n > E * len_j`` — no float mean, so the
    hash is bit-reproducible and the catalog oracle restates it in
    closed form over the deterministic fixture samples). Bits pack
    left-to-right into the LOW ``windows`` bits: window 0 lands at bit
    ``windows - 1`` — bit 63 at the default ``windows=64``, where the
    two's-complement fold applies; for ``windows < 64`` the high bits
    stay zero and the value is always non-negative (ADVICE r12: the old
    text claimed bit 63 unconditionally). Either way the BIGINT supports
    one-``bit_count(xor)`` Hamming distances downstream.

    Arrow-batched ``mapInPandas``; per-row codec failures land in
    ``error`` (ehash NULL). Feed to ``hamming_hash_pairs`` for blocked
    near-dup pairs — same pigeonhole-complete blocking as the image
    entry."""
    if not 1 <= windows <= 64:
        raise ValueError("windows must be in [1, 64] (one bit per window)")

    def ehash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "ehash", "decoded", "error")}
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                rec = dict(
                    media_id=int(mid), ehash=None, decoded=False, error=None
                )
                try:
                    d = decode_wav_audio(blob)
                    s = [abs(v) for v in d["samples"]]
                    n = len(s)
                    if n < windows:
                        raise ValueError(
                            f"clip too short: {n} samples < {windows} windows"
                        )
                    total = sum(s)
                    h = 0
                    for j in range(windows):
                        a, b = (j * n) // windows, ((j + 1) * n) // windows
                        e_j = sum(s[a:b])
                        h = (h << 1) | (
                            1 if e_j * n > total * (b - a) else 0
                        )
                    if h >= 1 << 63:  # two's-complement BIGINT
                        h -= 1 << 64
                    rec.update(ehash=h, decoded=True)
                except Exception as exc:  # noqa: BLE001
                    rec["error"] = f"{type(exc).__name__}: {exc}"
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(ehash, schema=EHASH_SCHEMA)


def synth_avi(df: DataFrame, id_col: str = "media_id", n_frames: int = 6) -> DataFrame:
    """Deterministic MJPEG-AVI fixture generator: ``n_frames`` frames of
    16x16 DC-only baseline JPEG per media id — frame f, block b carries
    dc = ((mid*7 + f*29 + b*13) % 128) - 64, so every sampled-and-decoded
    frame has the closed-form checksum the video oracle needs."""
    from tdei_extract_load_service_spark.multimodal.avi import encode_avi_mjpeg
    from tdei_extract_load_service_spark.multimodal.jpeg import encode_jpeg_gray_blocks

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                frames = [
                    encode_jpeg_gray_blocks(
                        16, 16,
                        [((mid * 7 + f * 29 + b * 13) % 128) - 64 for b in range(4)],
                    )
                    for f in range(n_frames)
                ]
                ids.append(mid)
                blobs.append(encode_avi_mjpeg(frames, 16, 16))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return df.select(id_col).mapInPandas(gen, schema="media_id bigint, content binary")


FRAME_DECODE_SCHEMA = (
    "media_id bigint, frame_idx int, n_total_frames int, width int, height int, "
    "n_channels int, pixel_checksum bigint, decoded boolean, error string"
)


def frame_sample_decoded(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """REAL video frame sampling: parse the AVI container (stdlib RIFF
    walk), pick ``n_frames`` evenly spaced frames (integer index math,
    oracle-reproducible), and DECODE each one with the stdlib baseline-JPEG
    decoder — Motion-JPEG is the codec family whose frames are complete
    JPEGs, which is what lets this tier be real without a codec library.
    Inter-frame codecs (H.264/VP9 in MP4/MKV) land in ``error`` per row —
    the remaining declared boundary. Arrow-batched ``mapInPandas``;
    spread() the input for single-file sources."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tdei_extract_load_service_spark.multimodal.avi import (
            decode_avi_frames,
            sample_frame_indices,
        )
        from tdei_extract_load_service_spark.multimodal.jpeg import decode_jpeg_pixels

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_idx", "n_total_frames", "width", "height",
                "n_channels", "pixel_checksum", "decoded", "error",
            )}

            def emit(mid, idx, total, rec):
                out["media_id"].append(int(mid))
                out["frame_idx"].append(idx)
                out["n_total_frames"].append(total)
                for k in ("width", "height", "n_channels", "pixel_checksum",
                          "decoded", "error"):
                    out[k].append(rec.get(k))

            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    frames = decode_avi_frames(blob)
                except Exception as exc:  # noqa: BLE001
                    emit(mid, None, None, {"decoded": False,
                                           "error": f"{type(exc).__name__}: {exc}"})
                    continue
                total = len(frames)
                for idx in sample_frame_indices(total, n_frames):
                    try:
                        d = decode_jpeg_pixels(frames[idx])
                        emit(mid, idx, total, {
                            "width": d["width"], "height": d["height"],
                            "n_channels": d["n_channels"],
                            "pixel_checksum": pixel_checksum(d["pixels"]),
                            "decoded": True, "error": None,
                        })
                    except Exception as exc:  # noqa: BLE001
                        emit(mid, idx, total, {"decoded": False,
                                               "error": f"{type(exc).__name__}: {exc}"})
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(sample, schema=FRAME_DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Sample ``n_frames`` evenly spaced byte windows from each media blob
    and hash them — the generic-container fallback plumbing (batch shape,
    fan-out schema, even-spacing index math) with a deterministic stand-in
    at the seek step. For MJPEG AVI use ``frame_sample_decoded``, which
    decodes real frames."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_idx", "frame_hash", "n_bytes")}
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                size = len(blob)
                window = max(size // max(n_frames, 1), 1)
                for i in range(n_frames):
                    # STUB: a real implementation seeks the codec to
                    # timestamp i/n_frames; the deterministic stand-in
                    # hashes the byte window at the same offset
                    start = min(i * window, max(size - 1, 0))
                    chunk = bytes(blob[start : start + window])
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_hash"].append(hashlib.sha256(chunk).hexdigest())
                    rows["n_bytes"].append(len(chunk))
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# audio: real stdlib WAV (RIFF/PCM16) decode + features
# ---------------------------------------------------------------------------

DECODE_AUDIO_SCHEMA = (
    "media_id bigint, sample_rate int, n_channels int, n_samples bigint, "
    "duration_ms double, rms double, zero_crossings bigint, "
    "decoded boolean, error string"
)


def encode_wav(sample_rate: int, samples: list[int], channels: int = 1) -> bytes:
    """Minimal stdlib PCM16 WAV writer (RIFF/fmt/data) — the audio fixture
    generator (the sandbox testdata ships no real media). ``samples`` are
    interleaved int16 values."""
    import struct

    body = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    data_len = len(body)
    riff_len = 4 + (8 + len(fmt)) + (8 + data_len)
    return (
        b"RIFF" + struct.pack("<I", riff_len) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_len) + body
    )


def decode_wav_audio(blob: bytes) -> dict:
    """Real stdlib WAV decode: RIFF chunk walk -> fmt (PCM16 only) ->
    int16 sample array. Compressed codecs (mp3/flac/ADPCM...) genuinely
    need a codec library and raise ``ValueError`` (caught into the error
    column by the operator — the declared stub boundary for lossy audio).

    Returns {sample_rate, n_channels, samples: list[int] (channel 0)}."""
    import struct

    if bytes(blob[:4]) != b"RIFF" or bytes(blob[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE signature")
    pos = 12
    sample_rate = channels = None
    data = None
    while pos + 8 <= len(blob):
        tag = bytes(blob[pos : pos + 4])
        (length,) = struct.unpack("<I", bytes(blob[pos + 4 : pos + 8]))
        body = bytes(blob[pos + 8 : pos + 8 + length])
        if tag == b"fmt ":
            audio_format, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV encoding (format={audio_format}, bits={bits}): "
                    "compressed audio needs a codec"
                )
        elif tag == b"data":
            data = body
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[: n * 2])
    return {
        "sample_rate": sample_rate,
        "n_channels": channels,
        "samples": list(samples[::channels]),  # channel 0
    }


def synth_wav(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic WAV fixture generator over an id column: sample i of
    media ``mid`` is ``((mid*31 + i*17 + 977) % 4001) - 2000`` (PCM16
    range), ``n_samples = 800 + (mid%5)*100``, ``sample_rate = 8000 +
    (mid%3)*4000`` — closed-form so a SQL oracle can recompute every
    feature. Arrow-batched mapInPandas, same plumbing as real ingest."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                n = 800 + (mid % 5) * 100
                sr = 8000 + (mid % 3) * 4000
                samples = [((mid * 31 + i * 17 + 977) % 4001) - 2000 for i in range(n)]
                ids.append(mid)
                blobs.append(encode_wav(sr, samples))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return df.select(id_col).mapInPandas(gen, schema="media_id bigint, content binary")


def decode_audio(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """WAV decode + per-clip features through ``mapInPandas``
    (Arrow-batched): sample rate, channel/sample counts, duration, RMS
    amplitude and zero-crossing count (the language/speech-pipeline
    basics). Non-WAV or compressed inputs land in the ``error`` column per
    row — the job never fails."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "duration_ms", "rms", "zero_crossings", "decoded", "error",
                )
            }
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                rec = dict(
                    media_id=int(mid), sample_rate=None, n_channels=None,
                    n_samples=None, duration_ms=None, rms=None,
                    zero_crossings=None, decoded=False, error=None,
                )
                try:
                    d = decode_wav_audio(blob)
                    s = d["samples"]
                    n = len(s)
                    # integer sum of squares is exact (< 2^53), so the
                    # rounded RMS is bit-identical to the SQL oracle's
                    sumsq = sum(v * v for v in s)
                    zc = sum(1 for i in range(1, n) if s[i - 1] * s[i] < 0)
                    rec.update(
                        sample_rate=d["sample_rate"], n_channels=d["n_channels"],
                        n_samples=n,
                        duration_ms=round(n * 1000.0 / d["sample_rate"], 3),
                        rms=round(math.sqrt(sumsq / n), 6) if n else 0.0,
                        zero_crossings=zc, decoded=True,
                    )
                except Exception as exc:  # noqa: BLE001
                    rec["error"] = f"{type(exc).__name__}: {exc}"
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(decode, schema=DECODE_AUDIO_SCHEMA)
