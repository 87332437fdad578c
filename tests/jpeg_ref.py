"""Shared reference IDCT for the JPEG test suites — the direct O(64^2)
sum straight from the standard's formula, deliberately NOT the separable
implementation the production decoder uses, so both suites validate
against one independent reference."""

from __future__ import annotations

import math


def ref_idct(coeffs):
    out = []
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coeffs[u * 8 + v]
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                    )
            val = int(round(s / 4.0)) + 128
            out.append(max(0, min(255, val)))
    return out
