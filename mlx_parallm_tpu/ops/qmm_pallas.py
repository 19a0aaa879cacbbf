"""Fused dequant + matmul Pallas TPU kernel for group-wise INT4/INT8 weights.

Placeholder gating module — the fused kernel lands incrementally; ``supported``
returns False until the kernel passes parity tests on hardware, at which point
``ops.qmm.qmm`` auto-dispatches here on TPU.
"""

from __future__ import annotations


def supported(x, packed, scales, group_size, bits) -> bool:
    return False


def qmm_pallas(x, packed, scales, biases, *, group_size, bits):  # pragma: no cover
    raise NotImplementedError("fused Pallas qmm not yet enabled")
