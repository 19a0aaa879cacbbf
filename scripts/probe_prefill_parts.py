"""Attribute prefill (TTFT) time: where do 225 ms go for b8/p128?

Times, with real device sync (np.asarray(device_get(...))):
  1. engine._prefill end-to-end at (b8, T=128, capacity 512)
  2. the same forward WITHOUT attention (qmm + norms + rope only)
  3. the same forward WITHOUT the lm_head
  4. qmm-only: the 7 projections at m = B*T rows, all 32 layers
  5. larger chunks (T=512) for scaling

Variants are traced fresh per run (new jit wrappers); only same-process
comparisons are meaningful on the tunnel.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 2400 python scripts/probe_prefill_parts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mlx_parallm_tpu.models.base import KVCache


def sync(x):
    return np.asarray(jax.device_get(x))


def timeit(fn, *args, reps=8):
    r = fn(*args)
    sync(jax.tree_util.tree_leaves(r)[0])  # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        sync(jax.tree_util.tree_leaves(r)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    model = bench.build_random_quantized_llama(layers=32)
    args = model.args
    b, t, cap = 8, 128, 512
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, 30000, size=(b, t)), jnp.int32)
    lengths = jnp.full((b,), t, jnp.int32)

    apply_fn = model.apply_fn()

    def mk_cache():
        return KVCache.init(
            32, b, cap, args.num_key_value_heads,
            args.hidden_size // args.num_attention_heads,
        )

    # 1. full prefill forward (logits + cache writes)
    full = jax.jit(lambda p, tok, c: apply_fn(p, tok, c)[0].sum())
    t_full = timeit(full, model.params, tokens, mk_cache())
    print(f"full prefill fwd T={t}: {1000 * t_full:.1f} ms", flush=True)

    # 2. hidden only (no lm_head)
    hid_fn = model.apply_fn_hidden()
    hid = jax.jit(lambda p, tok, c: hid_fn(p, tok, c)[0].sum())
    t_hid = timeit(hid, model.params, tokens, mk_cache())
    print(f"  no lm_head: {1000 * t_hid:.1f} ms", flush=True)

    # 3. no attention: qmm/norm/rope only — monkeypatch attention to bypass
    from mlx_parallm_tpu.ops import attention as ATT

    orig = ATT.update_and_attend

    def no_attn(q, k, v, cache, layer, **kw):
        return q, cache

    ATT.update_and_attend = no_attn
    try:
        noatt = jax.jit(lambda p, tok, c: apply_fn(p, tok, c)[0].sum())
        t_noatt = timeit(noatt, model.params, tokens, mk_cache())
    finally:
        ATT.update_and_attend = orig
    print(f"  no attention(+no KV write): {1000 * t_noatt:.1f} ms", flush=True)

    # 4. qmm-only floor: the four fused projections x 32 layers at m=b*t
    from mlx_parallm_tpu.core import params as P

    qcfg = args.qcfg
    x = jnp.asarray(
        rng.standard_normal((b * t, args.hidden_size)), jnp.bfloat16
    )

    def qmm_all(params, x):
        outs = []
        for lp in params["model"]["layers"]:
            a = P.linear(lp["self_attn"]["qkv_proj"], x, qcfg)
            o = P.linear(lp["self_attn"]["o_proj"], x, qcfg)
            g = P.linear(lp["mlp"]["gate_up_proj"], x, qcfg)
            dx = P.linear(
                lp["mlp"]["down_proj"],
                jnp.zeros((x.shape[0], 14336), jnp.bfloat16),
                qcfg,
            )
            outs.append(a.sum() + o.sum() + g.sum() + dx.sum())
        return jnp.stack(outs).sum()

    qmm_j = jax.jit(qmm_all)
    t_qmm = timeit(qmm_j, model.params, x)
    print(f"  qmm-only (m={b * t}): {1000 * t_qmm:.1f} ms", flush=True)

    # MXU floor for reference
    wbytes = 4.0e9
    flops = 2 * (b * t) * 6.74e9  # ~6.7B matmul params
    print(
        f"  floors: weights {1000 * wbytes / 819e9:.1f} ms, "
        f"MXU {1000 * flops / 197e12:.1f} ms",
        flush=True,
    )

    # 5. chunk scaling
    for t2 in (512,):
        tokens2 = jnp.asarray(
            rng.integers(1, 30000, size=(b, t2)), jnp.int32
        )
        cap2 = 1024
        c2 = KVCache.init(
            32, b, cap2, args.num_key_value_heads,
            args.hidden_size // args.num_attention_heads,
        )
        full2 = jax.jit(lambda p, tok, c: apply_fn(p, tok, c)[0].sum())
        t_full2 = timeit(full2, model.params, tokens2, c2, reps=4)
        print(
            f"full prefill fwd T={t2}: {1000 * t_full2:.1f} ms "
            f"({b * t2 / t_full2:.0f} tok/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
