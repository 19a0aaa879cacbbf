"""Time MoE prefill dispatch: per-expert cond-chain vs ragged grouped kernel.

Mixtral-ish shape: E=8 experts, top2 routing, K=4096, F=14336, T=256
prefill tokens (VERDICT r2 #6 'done' criterion). The cond-chain computes
every hit expert over ALL T rows; the ragged kernel computes T*top_k
routed rows.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache timeout 2400 \
       python scripts/probe_moe_ragged.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mlx_parallm_tpu.models import switch_layers as SL  # noqa: E402
from mlx_parallm_tpu.ops import quant  # noqa: E402

E, K, F, TOP_K, T = 8, 4096, 14336, 2, 256
GS, BITS = 64, 4
ITERS = 8


def stack(n, k, seed):
    nt = quant.choose_n_tile_expert(k, n, BITS, group_size=GS)
    wk3 = jax.random.bits(
        jax.random.PRNGKey(seed), (E, n // nt, k * BITS // 32, nt), jnp.uint32
    )
    scales = jnp.full((E, n, k // GS), 0.01, jnp.bfloat16)
    biases = jnp.zeros((E, n, k // GS), jnp.bfloat16)
    pairs = [
        quant.kernel_scale_mirrors(scales[e], biases[e], BITS)
        for e in range(E)
    ]
    return {
        "scales": scales,
        "biases": biases,
        "wk3": wk3,
        "sk3": jnp.stack([a for a, _ in pairs]),
        "bk3": jnp.stack([b for _, b in pairs]),
    }


def main():
    print(f"backend={jax.default_backend()} E={E} T={T} top{TOP_K}")
    p = {
        "gate_proj": stack(F, K, 0),
        "up_proj": stack(F, K, 1),
        "down_proj": stack(K, F, 2),
    }
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(T, K)).astype(np.float32) * 0.1).astype(
        jnp.bfloat16
    )
    idx = jnp.asarray(rng.integers(0, E, (T, TOP_K)).astype(np.int32))

    def timeit(fn):
        jf = jax.jit(
            lambda x, pp: jax.lax.scan(
                lambda c, _: (
                    (
                        c.astype(jnp.float32)
                        + jnp.sum(fn(pp, c, idx, (GS, BITS))) * 1e-12
                    ).astype(jnp.bfloat16),
                    None,
                ),
                x,
                None,
                length=ITERS,
            )[0]
        )
        r = jf(x0, p)
        np.asarray(jax.device_get(r))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = jf(x0, p)
            np.asarray(jax.device_get(r))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best

    def cond_path(pp, x, ids, qcfg):
        gate = SL.switch_linear(pp["gate_proj"], x, ids, qcfg)
        up = SL.switch_linear(pp["up_proj"], x, ids, qcfg)
        return SL.switch_mlp_down(pp, jax.nn.silu(gate) * up, ids, qcfg)

    t_ragged = timeit(SL.switch_glu_ragged)
    t_cond = timeit(cond_path)
    print(f"cond-chain : {t_cond*1e3:8.2f} ms/fwd")
    print(f"ragged     : {t_ragged*1e3:8.2f} ms/fwd  ({t_cond/t_ragged:.2f}x)")


if __name__ == "__main__":
    main()
