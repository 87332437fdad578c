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


def decode_image(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Decode images to (format, width, height, channels) through
    ``mapInPandas``.

    STUB BOUNDARY: without Pillow the decode step reports
    ``decoded=false, error='NotImplementedError: ...'`` per row — the
    Arrow plumbing, batch iteration and output schema are exactly what the
    real decoder uses.
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
                    rec["error"] = (
                        "NotImplementedError: image decode requires Pillow "
                        "(not installed in this environment)"
                    )
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(decode, schema=DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Sample ``n_frames`` evenly spaced byte windows from each media blob
    and hash them — the frame-sampling plumbing (batch shape, fan-out
    schema, even-spacing index math) with a deterministic stand-in for the
    real video codec at the clearly-marked seek step."""

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
