"""Verify Pallas input_output_aliases semantics needed by the fused
append+attend kernel: an aliased output whose out-spec touches only ONE
block per grid row must leave every other region of the buffer intact,
in interpret mode (CPU tests) and compiled (TPU).

Run: python scripts/probe_alias_semantics.py [tpu]
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(len_ref, x_ref, row_ref, o_ref, xo_ref, *, sblk, wblk):
    b = pl.program_id(0)
    si = pl.program_id(1)
    pos = len_ref[b]
    wb = pos // sblk

    # attention-style reduce over live blocks
    @pl.when(si == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(si * sblk < pos + 1)
    def _():
        o_ref[...] += jnp.sum(x_ref[...], axis=1, keepdims=True)

    # write the new row into the aliased slab at position `pos`
    @pl.when(si == wb)
    def _():
        w0 = (pos // wblk) * wblk - wb * sblk
        r = pos % wblk
        sub = x_ref[0, pl.ds(w0, wblk), :]
        mask = jax.lax.broadcasted_iota(jnp.int32, (wblk, 1), 0) == r
        xo_ref[0] = jnp.where(mask, row_ref[0], sub)


@functools.partial(jax.jit, static_argnames=("interpret",))
def run(x, lengths, row, interpret=False):
    b, s, d = x.shape
    sblk, wblk = 256, 64
    ns = s // sblk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec(
                (1, sblk, d),
                lambda bi, si, L: (bi, jnp.where(si * sblk < L[bi] + 1, si, 0), 0),
            ),
            pl.BlockSpec((1, 1, d), lambda bi, si, L: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, d), lambda bi, si, L: (bi, 0, 0)),
            pl.BlockSpec((1, wblk, d), lambda bi, si, L: (bi, L[bi] // wblk, 0)),
        ),
    )
    return pl.pallas_call(
        functools.partial(kernel, sblk=sblk, wblk=wblk),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b, s, d), x.dtype),
        ),
        input_output_aliases={1: 1},  # x (operand idx 1 incl. scalar) -> out 1
        interpret=interpret,
    )(lengths, x, row)


def main():
    interpret = "tpu" not in sys.argv[1:]
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    b, s, d = 4, 1024, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    row = jnp.asarray(rng.randn(b, 1, d).astype(np.float32))
    lengths = jnp.asarray([0, 63, 256, 1023 - 64], dtype=jnp.int32)

    o, x2 = run(x, lengths, row, interpret=interpret)
    x2 = np.asarray(jax.device_get(x2))
    xn = np.asarray(x).copy()
    for i, p in enumerate(np.asarray(lengths)):
        xn[i, p] = np.asarray(row)[i, 0]
    if np.allclose(x2, xn):
        print("ALIAS-WRITE-OK")
    else:
        bad = np.argwhere(~np.isclose(x2, xn))
        print("ALIAS-WRITE-MISMATCH", bad[:5], x2.shape)
    on = np.asarray(jax.device_get(o))
    print("reduce output finite:", np.isfinite(on).all())


if __name__ == "__main__":
    main()
