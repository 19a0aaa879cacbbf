"""Benchmark the flash-decode attention kernel on the real chip vs the XLA
sdpa path. In-jit scan timing (axon tunnel rules: dependent iterations inside
one jit, one device_get at the end)."""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from mlx_parallm_tpu.ops import attention, flash_decode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--s", type=int, default=4096)
    ap.add_argument("--hkv", type=int, default=32)
    ap.add_argument("--rep", type=int, default=1)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--len", type=int, default=None, help="live length")
    args = ap.parse_args()

    b, s, hkv, rep, d = args.batch, args.s, args.hkv, args.rep, args.d
    hq = hkv * rep
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)), jnp.bfloat16)
    live = args.len if args.len is not None else s - 1
    lengths = jnp.full((b,), live, jnp.int32)
    kv_bytes = 1 if args.int8 else 2
    if args.int8:
        k = jnp.asarray(
            rng.integers(-127, 127, (b, hkv, s, d)), jnp.int8
        )
        v = jnp.asarray(
            rng.integers(-127, 127, (b, hkv, s, d)), jnp.int8
        )
        ks = jnp.asarray(rng.random((b, hkv, s)) * 0.02, jnp.bfloat16)
        vs = jnp.asarray(rng.random((b, hkv, s)) * 0.02, jnp.bfloat16)
    else:
        k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
        ks = vs = None

    scale = d**-0.5

    def flash_many(q, k, v, lengths, ks, vs):
        def step(carry, _):
            q = carry
            o = flash_decode.flash_decode(
                q, k, v, lengths, scale=scale, k_scale=ks, v_scale=vs
            )
            # dependency chain: feed output back (cast keeps dtype)
            return (o * 1e-6 + q).astype(q.dtype), ()

        out, _ = jax.lax.scan(step, q, None, length=args.iters)
        return out

    def xla_many(q, k, v, lengths, ks, vs):
        if ks is not None:
            k = k.astype(jnp.bfloat16) * ks[..., None]
            v = v.astype(jnp.bfloat16) * vs[..., None]

        def step(carry, _):
            q = carry
            o = attention.sdpa_slab(q, k, v, q_offsets=lengths, scale=scale)
            return (o * 1e-6 + q).astype(q.dtype), ()

        out, _ = jax.lax.scan(step, q, None, length=args.iters)
        return out

    for name, fn in (("flash", flash_many), ("xla", xla_many)):
        jfn = jax.jit(fn)
        if name == "flash" and ks is None:
            args_t = (q, k, v, lengths, None, None)
        else:
            args_t = (q, k, v, lengths, ks, vs)
        r = jfn(*args_t)
        np.asarray(jax.device_get(r))  # warm
        t0 = time.perf_counter()
        r = jfn(*args_t)
        np.asarray(jax.device_get(r))
        dt = time.perf_counter() - t0 - 0.016  # axon sync overhead
        per = dt / args.iters
        traffic = 2 * b * (live + 1 if name == "flash" else s) * hkv * d * kv_bytes
        print(
            f"{name}: {per*1e6:.1f} us/call, "
            f"{traffic/per/1e9:.1f} GB/s effective"
        )


if __name__ == "__main__":
    main()
