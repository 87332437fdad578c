"""Property-based JPEG codec tests (hypothesis): for ANY quantized
spectrum the encode->decode round trip must agree with an independent
direct-formula IDCT — the shrinking search covers corner spectra (all
zeros, max-category DCs, dense AC, long zero runs) that hand-picked
fixtures miss. Pure driver-side (no Spark session).

Agreement is ``jpeg_ref.assert_idct_agrees``: bit-exact except at exact
.5 rounding ties of the true value, where either neighbour is accepted —
round 6's hypothesis run proved bit-identity between two independent
float accumulation orders is not a satisfiable contract (the discovered
counterexample is committed below as a regression ``@example``)."""

from __future__ import annotations


from hypothesis import example, given, settings
from hypothesis import strategies as st

from tdei_extract_load_service_spark.multimodal.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_gray_coeffs,
)


from tests.jpeg_ref import assert_idct_agrees  # noqa: E402

#: hypothesis-discovered r6 counterexample (2026-08-14--1fe61a54.patch):
#: DC=41 with a single AC=3 at natural index 36, q0=9 puts 21 of 64
#: pixels at exactly 177.5 — the direct-sum reference and the separable
#: decoder land on opposite sides of the tie.
_R6_TIE_BLOCK = [41] + [0] * 35 + [3] + [0] * 27


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
@example(blocks=[_R6_TIE_BLOCK], q0=9).via("discovered failure (r6)")
def test_roundtrip_matches_reference_idct(blocks, q0):
    q = [q0] + [q0] * 63
    width = 8 * len(blocks)
    blob = encode_jpeg_gray_coeffs(width, 8, blocks, qtable=q)
    d = decode_jpeg_pixels(blob)
    assert (d["width"], d["height"], d["n_channels"]) == (width, 8, 1)
    for b, nat in enumerate(blocks):
        got = [d["pixels"][yy * width + b * 8 + xx] for yy in range(8) for xx in range(8)]
        assert_idct_agrees(
            got, [nat[i] * q[i] for i in range(64)], where=f"block {b} "
        )


@settings(max_examples=20, deadline=None)
@given(dcs=st.lists(st.integers(-64, 63), min_size=1, max_size=8))
def test_dc_only_flat_tiles_property(dcs):
    from tdei_extract_load_service_spark.multimodal.jpeg import encode_jpeg_gray_blocks

    width = 8 * len(dcs)
    d = decode_jpeg_pixels(encode_jpeg_gray_blocks(width, 8, dcs))
    for b, dc in enumerate(dcs):
        tile = {d["pixels"][yy * width + b * 8 + xx] for yy in range(8) for xx in range(8)}
        assert tile == {2 * dc + 128}
