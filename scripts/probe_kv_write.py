"""Measure the decode KV append cost: broadcast masked write (rewrites the
whole (B, H, S, D) slab per layer) vs per-row scatter/DUS variants."""

import sys
import time

import jax
import jax.numpy as jnp

B, H, S, D = 8, 8, 512, 128
L = 32


def devtime(f, *args, iters=32):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    k = jnp.zeros((L, B, H, S, D), jnp.bfloat16)
    new = jnp.ones((B, H, 1, D), jnp.bfloat16)
    lengths = jnp.asarray([3, 100, 200, 300, 400, 450, 500, 70], jnp.int32)

    def masked_step(k, lengths):
        sel = (jnp.arange(S)[None, :] == lengths[:, None])[:, None, :, None]
        for layer in range(L):
            k_l = jnp.where(sel, new, k[layer])
            k = k.at[layer].set(k_l)
        return k, lengths + 1

    def scatter_step(k, lengths):
        b_idx = jnp.arange(B)
        for layer in range(L):
            k = k.at[layer, b_idx, :, lengths, :].set(new[:, :, 0, :])
        return k, lengths + 1

    def dus_vmap_step(k, lengths):
        def write_row(buf_row, off):
            return jax.lax.dynamic_update_slice(
                buf_row, new[0], (0, off, 0)
            )

        for layer in range(L):
            k = k.at[layer].set(jax.vmap(write_row)(k[layer], lengths))
        return k, lengths + 1

    for name, step in (
        ("masked", masked_step),
        ("scatter", scatter_step),
        ("dus_vmap", dus_vmap_step),
    ):
        def loop(k, lengths, step=step):
            def body(c, _):
                return step(*c), None

            return jax.lax.scan(body, (k, lengths % S), None, length=32)[0][0]

        f = jax.jit(loop)
        try:
            t = devtime(f, k, lengths)
            slab = L * B * H * S * D * 2
            print(
                f"{name}: {t*1e3:.3f} ms/step (slab {slab/1e9:.2f} GB)",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        k = jnp.zeros((L, B, H, S, D), jnp.bfloat16)


if __name__ == "__main__":
    main()
