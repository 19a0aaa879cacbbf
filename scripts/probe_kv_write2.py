"""KV append formulations under a REAL scan carry (donated, device_get sync).

The step ablation showed the per-layer masked rewrite costs ~4 ms of the
10.8 ms b8 decode step — far above its ~1.3 ms traffic bound. Candidates:

  v1_layer_where   - current production: per-layer where + at[layer].set
  v2_batch_where   - collect all layers' new rows, ONE fused where over the
                     whole (L,B,H,S,D) slab at end of step
  v3_batch_scatter - ONE advanced-index scatter for all layers/rows
  v4_list_where    - per-layer LIST carry (pytree of L arrays), where each
  v5_list_scatter  - list carry + per-layer scatter

Writes BOTH k and v per step, 64 steps per jit call, 3 reps, min time.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

B, H, S, D = 8, 8, 512, 128
L = 32
STEPS = 64


def timeit(jf, args, iters=3):
    k, v, lengths, new = args
    # k/v are donated: rebind them from each call's outputs.
    k, v, _, chk = jf(k, v, lengths, new)
    np.asarray(jax.device_get(chk))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        k, v, _, chk = jf(k, v, lengths, new)
        np.asarray(jax.device_get(chk))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def make(step_fn, list_carry=False):
    def outer(k, v, lengths, new):
        def body(carry, _):
            k, v, lengths = carry
            k, v = step_fn(k, v, lengths, new)
            return (k, v, lengths + 1), None

        (k, v, lengths), _ = jax.lax.scan(
            body, (k, v, lengths), None, length=STEPS
        )
        chk = sum(jnp.sum(x[:1, :1]) for x in jax.tree_util.tree_leaves(k))
        return k, v, lengths, chk.astype(jnp.float32)

    return jax.jit(outer, donate_argnums=(0, 1))


def fresh(list_carry=False):
    if list_carry:
        k = [jnp.zeros((B, H, S, D), jnp.bfloat16) for _ in range(L)]
        v = [jnp.zeros((B, H, S, D), jnp.bfloat16) for _ in range(L)]
    else:
        k = jnp.zeros((L, B, H, S, D), jnp.bfloat16)
        v = jnp.zeros((L, B, H, S, D), jnp.bfloat16)
    lengths = jnp.asarray([3, 100, 200, 300, 350, 380, 400, 70], jnp.int32)
    new = jnp.ones((L, B, H, D), jnp.bfloat16)
    return k, v, lengths, new


def v1_layer_where(k, v, lengths, new):
    sel = (jnp.arange(S)[None, :] == lengths[:, None])[:, None, :, None]
    for layer in range(L):
        k = k.at[layer].set(
            jnp.where(sel, new[layer][:, :, None, :], k[layer])
        )
        v = v.at[layer].set(
            jnp.where(sel, new[layer][:, :, None, :], v[layer])
        )
    return k, v


def v2_batch_where(k, v, lengths, new):
    sel = (jnp.arange(S)[None, :] == lengths[:, None])[
        None, :, None, :, None
    ]  # (1, B, 1, S, 1)
    n5 = new[:, :, :, None, :]  # (L, B, H, 1, D)
    k = jnp.where(sel, n5, k)
    v = jnp.where(sel, n5, v)
    return k, v


def v3_batch_scatter(k, v, lengths, new):
    b_idx = jnp.arange(B)
    # Advanced indices on non-adjacent axes move to the front: result dims
    # are (B, L, H, D).
    nb = jnp.transpose(new, (1, 0, 2, 3))
    k = k.at[:, b_idx, :, lengths, :].set(nb)
    v = v.at[:, b_idx, :, lengths, :].set(nb)
    return k, v


def v4_list_where(k, v, lengths, new):
    sel = (jnp.arange(S)[None, :] == lengths[:, None])[:, None, :, None]
    k = [
        jnp.where(sel, new[i][:, :, None, :], k[i]) for i in range(L)
    ]
    v = [
        jnp.where(sel, new[i][:, :, None, :], v[i]) for i in range(L)
    ]
    return k, v


def v5_list_scatter(k, v, lengths, new):
    b_idx = jnp.arange(B)
    k = [k[i].at[b_idx, :, lengths, :].set(new[i]) for i in range(L)]
    v = [v[i].at[b_idx, :, lengths, :].set(new[i]) for i in range(L)]
    return k, v


def main():
    print(f"backend={jax.default_backend()} L={L} B={B} S={S}")
    for name, fn, lst in (
        ("v1_layer_where", v1_layer_where, False),
        ("v2_batch_where", v2_batch_where, False),
        ("v3_batch_scatter", v3_batch_scatter, False),
        ("v4_list_where", v4_list_where, True),
        ("v5_list_scatter", v5_list_scatter, True),
    ):
        jf = make(fn, lst)
        t = timeit(jf, fresh(lst))
        gb = 2 * L * B * H * S * D * 2 * 2 / 1e9  # r+w, k+v
        print(
            f"{name:16s} {t*1e3:7.3f} ms/step  "
            f"(full-rewrite bound {gb/0.819*1e3/1:6.2f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
