"""Stdlib baseline-JPEG decode tier (VERDICT r4 #5): the decoder must run
the real path — Huffman decode, DC prediction, dequant, IDCT — and agree
with (a) the DC-only closed form and (b) an independent direct-formula
IDCT on full-AC spectra. Plus the Spark-side dispatch plumbing."""

from __future__ import annotations

import random

import pytest

from tdei_extract_load_service_spark.multimodal.jpeg import (
    ZIGZAG,
    decode_jpeg_pixels,
    encode_jpeg_gray_blocks,
    encode_jpeg_gray_coeffs,
)


from tests.jpeg_ref import assert_idct_agrees  # noqa: E402


def test_dc_only_blocks_decode_to_flat_tiles():
    dcs = [5, -17, 63, -64, 0, 42, -1, 13]
    d = decode_jpeg_pixels(encode_jpeg_gray_blocks(16, 32, dcs))
    assert (d["width"], d["height"], d["n_channels"]) == (16, 32, 1)
    for b, dc in enumerate(dcs):
        by, bx = divmod(b, 2)
        expected = 2 * dc + 128
        tile = {
            d["pixels"][(by * 8 + yy) * 16 + bx * 8 + xx]
            for yy in range(8)
            for xx in range(8)
        }
        assert tile == {expected}, f"block {b} not flat {expected}: {tile}"


def test_full_ac_spectrum_matches_independent_idct():
    random.seed(11)
    q = [16] * 64
    blocks = []
    for _ in range(6):
        nat = [0] * 64
        nat[0] = random.randint(-40, 40)
        for _k in range(8):
            nat[random.randrange(1, 64)] = random.randint(-12, 12)
        nat[63] = 3  # forces a ZRL-containing run
        blocks.append(nat)
    d = decode_jpeg_pixels(encode_jpeg_gray_coeffs(24, 16, blocks, qtable=q))
    for b, nat in enumerate(blocks):
        by, bx = divmod(b, 3)
        got = [
            d["pixels"][(by * 8 + yy) * 24 + bx * 8 + xx]
            for yy in range(8)
            for xx in range(8)
        ]
        assert_idct_agrees(got, [nat[i] * q[i] for i in range(64)], where=f"block {b} ")


def test_nontrivial_quant_table_is_applied():
    q = [16] * 64
    q[9] = 40  # AC (1,1)
    nat = [0] * 64
    nat[0], nat[9] = 10, 3
    d = decode_jpeg_pixels(encode_jpeg_gray_coeffs(8, 8, [nat], qtable=q))
    assert_idct_agrees(list(d["pixels"]), [nat[i] * q[i] for i in range(64)])


def test_dc_prediction_spans_blocks():
    # large DC jumps across blocks exercise diff categories both signs
    dcs = [0, 63, -64, 0, 63, -64]
    d = decode_jpeg_pixels(encode_jpeg_gray_blocks(48, 8, dcs))
    for b, dc in enumerate(dcs):
        assert d["pixels"][b * 8] == 2 * dc + 128


def test_declared_boundaries_raise():
    blob = bytearray(encode_jpeg_gray_blocks(16, 16, [1, 2, 3, 4]))
    # flip SOF0 -> SOF2 (progressive): find FFC0
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_pixels(bytes(blob))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_pixels(b"\x89PNG\r\n\x1a\n")


def test_zigzag_is_an_involution_layout():
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8


def test_spark_dispatch_mixed_png_jpeg(spark):
    """decode_image_pixels routes by magic number: one frame carrying both
    PNG and JPEG blobs decodes both through the same Arrow plumbing."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.multimodal.binary_ops import (
        decode_image_pixels,
        synth_jpeg,
        synth_png,
    )

    ids = spark.range(40).select(F.col("id").alias("media_id"))
    mixed = synth_png(ids.where("media_id % 2 = 0")).unionByName(
        synth_jpeg(ids.where("media_id % 2 = 1"))
    )
    out = decode_image_pixels(mixed).collect()
    assert len(out) == 40
    by_id = {r["media_id"]: r for r in out}
    assert all(r["decoded"] for r in out), [r for r in out if not r["decoded"]][:2]
    # spot-check one of each against the driver-side decoders
    jr = by_id[1]
    assert (jr["width"], jr["height"], jr["n_channels"]) == (16, 16, 1)
    pr = by_id[2]
    assert pr["width"] == 8 + 2 % 8 and pr["n_channels"] == 3 + 2 % 2


def test_catalog_entry_against_inline_closed_form(spark):
    from tdei_extract_load_service_spark.catalog import REGISTRY

    rows = REGISTRY["multimodal_decode_jpeg"].query(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        mid = r["doc_id"]
        exp = sum(
            (2 * ((mid * 7 + b * 13) % 128))
            * (8192 * (b // 2) + 512 * (b % 2) + 3872)
            for b in range(4)
        )
        assert r["pixel_checksum"] == exp and r["width"] == 16


def test_resize_chain_png_and_jpeg(spark):
    """decode->nearest-neighbor-resize over both codec tiers; PNG resize
    verified against a driver-side brute force of the same generator."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.multimodal.binary_ops import (
        decode_png_pixels,
        pixel_checksum,
        resize_image_pixels,
        synth_jpeg,
        synth_png,
    )

    ids = spark.range(12).select(F.col("id").alias("media_id"))
    out_j = {r["media_id"]: r for r in
             resize_image_pixels(synth_jpeg(ids), 8, 8).collect()}
    assert all(r["decoded"] and r["width"] == 8 for r in out_j.values())

    out_p = {r["media_id"]: r for r in
             resize_image_pixels(synth_png(ids), 4, 4).collect()}
    # brute-force the same resize driver-side from the PNG generator spec
    from tdei_extract_load_service_spark.multimodal.binary_ops import encode_png

    for mid in (0, 3, 7, 11):
        w, h, c = 8 + mid % 8, 8 + mid % 5, 3 + mid % 2
        px = bytes((mid * 7 + i) % 256 for i in range(w * h * c))
        d = decode_png_pixels(encode_png(w, h, c, px))
        resized = bytearray()
        for y in range(4):
            sy = (y * h) // 4
            for x in range(4):
                sx = (x * w) // 4
                base = (sy * w + sx) * c
                resized += d["pixels"][base : base + c]
        assert out_p[mid]["pixel_checksum"] == pixel_checksum(bytes(resized)), mid
        assert (out_p[mid]["src_width"], out_p[mid]["n_channels"]) == (w, c)


def test_catalog_resize_entry_closed_form(spark):
    from tdei_extract_load_service_spark.catalog import REGISTRY

    rows = REGISTRY["multimodal_resize"].query(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        mid = r["doc_id"]
        exp = sum(
            (2 * ((mid * 7 + b * 13) % 128)) * (512 * (b // 2) + 64 * (b % 2) + 232)
            for b in range(4)
        )
        assert r["pixel_checksum"] == exp and r["width"] == 8


def test_video_frame_sampling_decodes_real_frames(spark):
    """AVI/MJPEG tier: container parse -> even sampling -> real JPEG
    decode per frame; non-AVI input lands in the error column."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.multimodal.binary_ops import (
        frame_sample_decoded,
        synth_avi,
    )

    ids = spark.range(10).select(F.col("id").alias("media_id"))
    out = frame_sample_decoded(synth_avi(ids, n_frames=6), n_frames=3).collect()
    assert len(out) == 30
    assert all(r["decoded"] and r["n_total_frames"] == 6 for r in out)
    assert sorted({r["frame_idx"] for r in out}) == [0, 2, 4]
    # spot-check one checksum against the fixture's closed form
    r = next(x for x in out if x["media_id"] == 7 and x["frame_idx"] == 2)
    exp = sum(
        (2 * ((7 * 7 + 2 * 29 + b * 13) % 128))
        * (8192 * (b // 2) + 512 * (b % 2) + 3872)
        for b in range(4)
    )
    assert r["pixel_checksum"] == exp

    # a non-AVI blob: per-row error, job survives
    bad = spark.createDataFrame([(99, bytearray(b"\xff\xd8\xffnot a riff"))],
                                "media_id long, content binary")
    errs = frame_sample_decoded(bad).collect()
    assert len(errs) == 1 and not errs[0]["decoded"] and "AVI" in errs[0]["error"]


def test_non_interleaved_color_jpeg_is_a_declared_boundary():
    """Code-review r5: a 3-component SOF with a 1-component scan (legal
    non-interleaved baseline) used to silently return n_channels=3 over a
    single decoded plane; it must raise into the error column instead."""
    import struct

    blob = encode_jpeg_gray_blocks(16, 16, [1, 2, 3, 4])
    i = blob.find(b"\xff\xc0")
    (seglen,) = struct.unpack(">H", blob[i + 2 : i + 4])
    # rebuild SOF0 claiming 3 components (4:4:4), keep the 1-component SOS
    prec_dims = blob[i + 4 : i + 9]  # precision + height + width
    sof3 = (
        b"\xff\xc0" + struct.pack(">H", 2 + 6 + 9) + prec_dims + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    )
    patched = blob[:i] + sof3 + blob[i + 2 + seglen:]
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg_pixels(patched)


def test_avi_stream_header_is_full_56_bytes():
    """Code-review r5: strh was 4 bytes short of AVISTREAMHEADER."""
    import struct

    from tdei_extract_load_service_spark.multimodal.avi import encode_avi_mjpeg

    blob = encode_avi_mjpeg([encode_jpeg_gray_blocks(16, 16, [0, 0, 0, 0])], 16, 16)
    i = blob.find(b"strh")
    (size,) = struct.unpack("<I", blob[i + 4 : i + 8])
    assert size == 56, f"AVISTREAMHEADER must be 56 bytes, got {size}"
