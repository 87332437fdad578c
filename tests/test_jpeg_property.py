"""Property-based JPEG codec tests (hypothesis): for ANY quantized
spectrum the encode->decode round trip must agree with an independent
direct-formula IDCT — the shrinking search covers corner spectra (all
zeros, max-category DCs, dense AC, long zero runs) that hand-picked
fixtures miss. Pure driver-side (no Spark session)."""

from __future__ import annotations


from hypothesis import given, settings
from hypothesis import strategies as st

from tdei_extract_load_service_spark.multimodal.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_gray_coeffs,
)


from tests.jpeg_ref import ref_idct as _ref_idct  # noqa: E402


@st.composite
def _block(draw):
    # sparse spectrum: a DC plus up to 10 AC coefficients at arbitrary
    # zigzag-scattered positions (hypothesis shrinks toward empty)
    nat = [0] * 64
    nat[0] = draw(st.integers(-100, 100))
    n_ac = draw(st.integers(0, 10))
    for _ in range(n_ac):
        pos = draw(st.integers(1, 63))
        nat[pos] = draw(st.integers(-64, 64).filter(lambda v: v != 0))
    return nat


@settings(max_examples=40, deadline=None)
@given(blocks=st.lists(_block(), min_size=1, max_size=4), q0=st.integers(1, 32))
def test_roundtrip_matches_reference_idct(blocks, q0):
    q = [q0] + [q0] * 63
    width = 8 * len(blocks)
    blob = encode_jpeg_gray_coeffs(width, 8, blocks, qtable=q)
    d = decode_jpeg_pixels(blob)
    assert (d["width"], d["height"], d["n_channels"]) == (width, 8, 1)
    for b, nat in enumerate(blocks):
        exp = _ref_idct([nat[i] * q[i] for i in range(64)])
        got = [d["pixels"][yy * width + b * 8 + xx] for yy in range(8) for xx in range(8)]
        assert got == exp


@settings(max_examples=20, deadline=None)
@given(dcs=st.lists(st.integers(-64, 63), min_size=1, max_size=8))
def test_dc_only_flat_tiles_property(dcs):
    from tdei_extract_load_service_spark.multimodal.jpeg import encode_jpeg_gray_blocks

    width = 8 * len(dcs)
    d = decode_jpeg_pixels(encode_jpeg_gray_blocks(width, 8, dcs))
    for b, dc in enumerate(dcs):
        tile = {d["pixels"][yy * width + b * 8 + xx] for yy in range(8) for xx in range(8)}
        assert tile == {2 * dc + 128}
