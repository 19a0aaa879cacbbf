"""Accurate per-op timings: N back-to-back async dispatches, ONE final sync.

The tunnel costs ~16 ms per host sync, so per-call timeit lies; amortize it.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import build_random_quantized_llama  # noqa: E402
from mlx_parallm_tpu.ops import qmm, sampling  # noqa: E402


def timeit(fn, n=100, warmup=3):
    r = None
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def report(name, t, weight_bytes=None, flops=None):
    extra = ""
    if weight_bytes:
        extra += f"  {weight_bytes/1e9/t:.0f} GB/s"
    if flops:
        extra += f"  {flops/1e12/t:.1f} TFLOP/s"
    print(f"{name}: {t*1e3:.3f} ms{extra}")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    model = build_random_quantized_llama(layers=1)
    p0 = model.params["model"]["layers"][0]

    shapes = [
        ("qkv   (4096->6144)", p0["self_attn"]["qkv_proj"], 4096),
        ("o     (4096->4096)", p0["self_attn"]["o_proj"], 4096),
        ("gateup(4096->28672)", p0["mlp"]["gate_up_proj"], 4096),
        ("down  (14336->4096)", p0["mlp"]["down_proj"], 14336),
    ]
    for name, p, k in shapes:
        x = jnp.ones((batch, k), jnp.bfloat16)
        f = jax.jit(
            lambda x, wk, s, b: qmm.qmm(
                x, None, s, b, group_size=64, bits=4, q_kernel=wk
            )
        )
        t = timeit(lambda: f(x, p["wk"], p["scales"], p["biases"]))
        report(f"m={batch} {name}", t, weight_bytes=p["wk"].size * 4)

    # all four chained (one layer's worth of matmuls, fused dispatch)
    def layer_mms(x):
        a = qmm.qmm(x, None, shapes[0][1]["scales"], shapes[0][1]["biases"],
                    group_size=64, bits=4, q_kernel=shapes[0][1]["wk"])
        o = qmm.qmm(a[:, :4096], None, shapes[1][1]["scales"],
                    shapes[1][1]["biases"], group_size=64, bits=4,
                    q_kernel=shapes[1][1]["wk"])
        g = qmm.qmm(o, None, shapes[2][1]["scales"], shapes[2][1]["biases"],
                    group_size=64, bits=4, q_kernel=shapes[2][1]["wk"])
        d = qmm.qmm(g[:, :14336], None, shapes[3][1]["scales"],
                    shapes[3][1]["biases"], group_size=64, bits=4,
                    q_kernel=shapes[3][1]["wk"])
        return d

    x = jnp.ones((batch, 4096), jnp.bfloat16)
    f = jax.jit(layer_mms)
    wb = sum(s[1]["wk"].size * 4 for s in shapes)
    t = timeit(lambda: f(x))
    report(f"m={batch} full layer mms", t, weight_bytes=wb)

    # lm_head bf16
    emb = jax.random.normal(jax.random.PRNGKey(0), (32000, 4096), jnp.bfloat16)
    xh = jnp.ones((batch, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a, w: a @ w.T)
    t = timeit(lambda: mm(xh, emb))
    report("lm_head bf16 (4096->32000)", t, weight_bytes=emb.size * 2)

    # sampling
    logits = jax.random.normal(jax.random.PRNGKey(1), (batch, 32000))
    key = jax.random.PRNGKey(0)
    temps = jnp.zeros((batch,))
    top_ps = jnp.ones((batch,))
    samp = jax.jit(lambda l, k: sampling.sample_tokens(l, k, temps, top_ps))
    t = timeit(lambda: samp(logits, key))
    report("sample_tokens (argsort)", t)
    am = jax.jit(lambda l: (jnp.argmax(l, -1),
                            jnp.max(jax.nn.log_softmax(l, -1), -1)))
    t = timeit(lambda: am(logits))
    report("greedy argmax+lp", t)

    # attention decode shapes: q (B,1,32,128), kv slab (B,512,8,128)
    from mlx_parallm_tpu.ops import attention
    q = jax.random.normal(jax.random.PRNGKey(2), (batch, 1, 32, 128), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(3), (batch, 512, 8, 128), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(4), (batch, 512, 8, 128), jnp.bfloat16)
    offs = jnp.full((batch,), 300, jnp.int32)
    att = jax.jit(lambda q, k, v, o: attention.sdpa(
        q, k, v, q_offsets=o, scale=0.088))
    t = timeit(lambda: att(q, k, v, offs))
    report("sdpa decode (S=512)", t, weight_bytes=k.size * 2 * 2)

    # RoPE + rmsnorm footprint check: one full decode step residual ops
    print("done")


if __name__ == "__main__":
    main()
