"""Pure device-compute timings: loop the op inside ONE jitted lax.scan.

Removes all RPC/dispatch noise from the tunnel. Each op consumes the
previous iteration's output so XLA can't elide or overlap iterations.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import build_random_quantized_llama  # noqa: E402
from mlx_parallm_tpu.ops import qmm, sampling, attention  # noqa: E402

ITERS = 64


def devtime(make_step, x0, n=ITERS):
    """Time n dependent iterations of step inside one jit; returns s/iter."""

    def body(carry, _):
        return make_step(carry), None

    f = jax.jit(lambda x: jax.lax.scan(body, x, None, length=n)[0])
    r = f(x0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(x0)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def report(name, t, weight_bytes=None):
    extra = f"  {weight_bytes/1e9/t:.0f} GB/s" if weight_bytes else ""
    print(f"{name}: {t*1e3:.3f} ms{extra}")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    model = build_random_quantized_llama(layers=1)
    p0 = model.params["model"]["layers"][0]

    def q(p, x):
        return qmm.qmm(x, None, p["scales"], p["biases"], group_size=64,
                       bits=4, q_kernel=p["wk"])

    specs = [
        ("qkv   (4096->6144)", p0["self_attn"]["qkv_proj"], 4096, 6144),
        ("o     (4096->4096)", p0["self_attn"]["o_proj"], 4096, 4096),
        ("gateup(4096->28672)", p0["mlp"]["gate_up_proj"], 4096, 28672),
        ("down  (14336->4096)", p0["mlp"]["down_proj"], 14336, 4096),
    ]
    for name, p, k, n_out in specs:
        x0 = jnp.ones((batch, k), jnp.bfloat16)

        def step(x, p=p, k=k, n_out=n_out):
            y = q(p, x)
            # fold output back to input width to chain iterations
            if n_out >= k:
                return y[:, :k]
            reps = (k + n_out - 1) // n_out
            return jnp.tile(y, (1, reps))[:, :k]

        t = devtime(step, x0)
        report(f"m={batch} {name}", t, weight_bytes=p["wk"].size * 4)

    # one layer's four matmuls chained
    def layer_step(x):
        a = q(specs[0][1], x)
        o = q(specs[1][1], a[:, :4096])
        g = q(specs[2][1], o)
        d = q(specs[3][1], g[:, :14336])
        return d

    t = devtime(layer_step, jnp.ones((batch, 4096), jnp.bfloat16))
    wb = sum(s[1]["wk"].size * 4 for s in specs)
    report(f"m={batch} full layer mms", t, weight_bytes=wb)

    # lm_head
    emb = jax.random.normal(jax.random.PRNGKey(0), (32000, 4096), jnp.bfloat16)

    def lm_step(x):
        y = (x @ emb.T).astype(jnp.bfloat16)
        return jnp.tile(y[:, :4000], (1, 2))[:, :4096] * 1e-3

    t = devtime(lm_step, jnp.ones((batch, 4096), jnp.bfloat16))
    report("lm_head bf16", t, weight_bytes=emb.size * 2)

    # sampling chained via logits perturbation
    temps = jnp.zeros((batch,))
    top_ps = jnp.ones((batch,))
    key = jax.random.PRNGKey(0)

    def samp_step(l):
        tok, lp = sampling.sample_tokens(l, key, temps, top_ps)
        return l + lp[:, None] * 1e-6

    t = devtime(samp_step, jax.random.normal(jax.random.PRNGKey(1), (batch, 32000)))
    report("sample_tokens (argsort)", t)

    def greedy_step(l):
        lp = jax.nn.log_softmax(l, -1)
        tok = jnp.argmax(lp, -1)
        return l + jnp.take_along_axis(lp, tok[:, None], 1) * 1e-6

    t = devtime(greedy_step, jax.random.normal(jax.random.PRNGKey(1), (batch, 32000)))
    report("greedy argmax+lp", t)

    # sdpa decode
    kk = jax.random.normal(jax.random.PRNGKey(3), (batch, 512, 8, 128), jnp.bfloat16)
    vv = jax.random.normal(jax.random.PRNGKey(4), (batch, 512, 8, 128), jnp.bfloat16)
    offs = jnp.full((batch,), 300, jnp.int32)

    def att_step(qx):
        y = attention.sdpa(qx, kk, vv, q_offsets=offs, scale=0.088)
        return qx + y * 1e-6

    t = devtime(att_step, jax.random.normal(jax.random.PRNGKey(2),
                                            (batch, 1, 32, 128), jnp.bfloat16))
    report("sdpa decode (S=512)", t, weight_bytes=kk.size * 2 * 2)


if __name__ == "__main__":
    main()
