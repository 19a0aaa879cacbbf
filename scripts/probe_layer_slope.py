"""Separate per-scan-iteration overhead from true per-layer compute: time
scans whose iterations apply the 4-matmul layer stack L times (L=1,2,4).
slope = true per-layer cost; intercept = per-iteration overhead."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import build_random_quantized_llama  # noqa: E402
from mlx_parallm_tpu.ops import qmm  # noqa: E402

ITERS = 64


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    model = build_random_quantized_llama(layers=1)
    p0 = model.params["model"]["layers"][0]

    def q(p, x):
        return qmm.qmm(x, None, p["scales"], p["biases"], group_size=64,
                       bits=4, q_kernel=p["wk"])

    def layer(x):
        a = q(p0["self_attn"]["qkv_proj"], x)
        o = q(p0["self_attn"]["o_proj"], a[:, :4096])
        g = q(p0["mlp"]["gate_up_proj"], o)
        d = q(p0["mlp"]["down_proj"], g[:, :14336])
        return d.astype(jnp.bfloat16)

    wb = (
        p0["self_attn"]["qkv_proj"]["wk"].size
        + p0["self_attn"]["o_proj"]["wk"].size
        + p0["mlp"]["gate_up_proj"]["wk"].size
        + p0["mlp"]["down_proj"]["wk"].size
    ) * 4

    times = {}
    for reps, unroll in ((1, 1), (2, 1), (4, 1), (1, 4), (1, 8)):

        def body(carry, _):
            x = carry
            for _ in range(reps):
                x = layer(x) * (1.0 / reps)
            return x, None

        f = jax.jit(
            lambda x: jax.lax.scan(
                body, x, None, length=ITERS, unroll=unroll
            )[0]
        )
        x0 = jnp.ones((batch, 4096), jnp.bfloat16)
        r = f(x0)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = f(x0)
        jax.block_until_ready(r)
        t = (time.perf_counter() - t0) / ITERS
        if unroll == 1:
            times[reps] = t
        print(f"reps={reps} unroll={unroll}: {t*1e3:.3f} ms/iter")

    slope = (times[4] - times[1]) / 3
    intercept = times[1] - slope
    print(
        f"per-layer: {slope*1e3:.3f} ms ({wb/1e9/slope:.0f} GB/s), "
        f"per-iteration overhead: {intercept*1e3:.3f} ms"
    )
    print(
        f"=> 32-layer step estimate {32*slope*1e3 + intercept*1e3:.1f} ms"
    )


if __name__ == "__main__":
    main()
