"""Real-TPU kernel equivalence checks (VERDICT r3 #6).

The pytest suite runs Pallas kernels in CPU interpret mode with fp32
compute; the bf16 MXU path that production uses is exercised here on the
live chip, against XLA dequant/einsum references. A tile or bitcast
regression fails THIS script, not just the bench number.

Covered: qmm_pallas (int4 + int8, m=16/32, the down_proj shape),
flash_decode (bf16 + int8 KV), flash_append_attend (bf16 + int8, slab
contents included), ragged grouped MoE qmm.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 2400 python scripts/tpu_equiv_check.py
Exits 0 on pass, 1 on any mismatch. Invoked via pytest when
MLX_PARALLM_TPU_TESTS=1 (tests/test_tpu_kernels.py).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

# References must take the pure XLA path even where a kernel would
# normally dispatch (e.g. int8 decode at S=512).
os.environ["MLX_PARALLM_NO_FLASH"] = "1"
os.environ["MLX_PARALLM_NO_FLASH_PREFILL"] = "1"
os.environ["MLX_PARALLM_NO_FUSED"] = "1"

from mlx_parallm_tpu.models.base import KVCache, QuantizedKVCache  # noqa: E402
from mlx_parallm_tpu.ops import (  # noqa: E402
    attention,
    flash_append,
    flash_decode,
    qmm,
    quant,
)

FAILURES = []


def check(name, got, want, tol):
    got = np.asarray(jax.device_get(got), np.float32)
    want = np.asarray(jax.device_get(want), np.float32)
    scale = np.abs(want).max() + 1e-9
    rel = np.abs(got - want).max() / scale
    status = "ok" if rel < tol else "FAIL"
    print(f"{name}: rel_err={rel:.5f} (tol {tol}) {status}", flush=True)
    if rel >= tol:
        FAILURES.append(name)


def check_exact(name, got, want):
    got = np.asarray(jax.device_get(got))
    want = np.asarray(jax.device_get(want))
    ok = np.array_equal(got, want)
    print(f"{name}: exact={'ok' if ok else 'FAIL'}", flush=True)
    if not ok:
        FAILURES.append(name)


def qmm_checks():
    rng = np.random.default_rng(0)
    for m, k, n, bits in (
        (16, 4096, 4096, 4),
        (32, 4096, 4096, 4),
        (16, 14336, 4096, 4),  # down_proj: whole-K nt=512 tiling
        (1024, 4096, 4096, 4),  # prefill m: reordered (N, M) grid
        (16, 4096, 4096, 8),
    ):
        w = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32) * 0.05)
        packed, scales, biases = quant.quantize(w, 64, bits)
        nt = quant.choose_n_tile(k, n, bits)
        wk = quant.tile_kernel(quant.kernel_pack(packed, 64, bits), nt)
        sk, bk = quant.kernel_scale_mirrors(scales, biases, bits)
        x = jnp.asarray(
            rng.normal(size=(m, k)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ref = qmm.qmm(
            x, packed, scales, biases, group_size=64, bits=bits,
            impl="dequant",
        )
        got = qmm.qmm(
            x, packed, scales, biases, group_size=64, bits=bits,
            q_kernel=wk, q_scales_t=sk, q_biases_t=bk, impl="pallas",
        )
        check(f"qmm int{bits} m={m} {k}x{n}", got, ref, 2e-2)

    # Per-column-scale layout (G == 1): the scale-free kernel body + XLA
    # epilogue scale must match the explicit dequant matmul.
    for m, k, n, bits in ((16, 4096, 4096, 4), (16, 4096, 4096, 8)):
        w = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32) * 0.05)
        packed, scales, biases = quant.quantize(w, k, bits)
        nt = quant.choose_n_tile(k, n, bits, group_size=k)
        wk = quant.tile_kernel(quant.kernel_pack(packed, k, bits), nt)
        sk, bk = quant.kernel_scale_mirrors(scales, biases, bits)
        x = jnp.asarray(
            rng.normal(size=(m, k)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ref = qmm.qmm(
            x, packed, scales, biases, group_size=k, bits=bits,
            impl="dequant",
        )
        got = qmm.qmm(
            x, packed, scales, biases, group_size=k, bits=bits,
            q_kernel=wk, q_scales_t=sk, q_biases_t=bk, impl="pallas",
        )
        check(f"qmm-column int{bits} m={m} {k}x{n}", got, ref, 2e-2)


def flash_checks():
    rng = np.random.default_rng(1)
    b, hkv, rep, s, d = 4, 4, 4, 1024, 128
    q = jnp.asarray(
        rng.standard_normal((b, 1, hkv * rep, d)), jnp.bfloat16
    )
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    lengths = jnp.asarray([0, 500, 1023, 77], jnp.int32)
    ref = attention.sdpa_slab(q, k, v, q_offsets=lengths, scale=d**-0.5)
    got = flash_decode.flash_decode(q, k, v, lengths, scale=d**-0.5)
    check("flash_decode bf16", got, ref, 3e-2)

    xf = np.asarray(k, np.float32)
    sc = np.maximum(np.abs(xf).max(-1) / 127.0, 1e-8)
    k8 = jnp.asarray(
        np.clip(np.round(xf / sc[..., None]), -127, 127).astype(np.int8)
    )
    ks = jnp.asarray(sc, jnp.bfloat16)
    vf = np.asarray(v, np.float32)
    vsc = np.maximum(np.abs(vf).max(-1) / 127.0, 1e-8)
    v8 = jnp.asarray(
        np.clip(np.round(vf / vsc[..., None]), -127, 127).astype(np.int8)
    )
    vs = jnp.asarray(vsc, jnp.bfloat16)
    kd = k8.astype(jnp.bfloat16) * ks[..., None]
    vd = v8.astype(jnp.bfloat16) * vs[..., None]
    ref8 = attention.sdpa_slab(q, kd, vd, q_offsets=lengths, scale=d**-0.5)
    got8 = flash_decode.flash_decode(
        q, k8, v8, lengths, scale=d**-0.5, k_scale=ks, v_scale=vs
    )
    check("flash_decode int8", got8, ref8, 4e-2)


def prefill_checks():
    from mlx_parallm_tpu.ops import flash_prefill

    rng = np.random.default_rng(5)
    b, t, hkv, rep, s, d = 2, 128, 8, 4, 512, 128
    q = jnp.asarray(
        rng.standard_normal((b, t, hkv * rep, d)), jnp.bfloat16
    )
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    offsets = jnp.asarray([0, 350], jnp.int32)
    ref = attention.sdpa_slab(q, k, v, q_offsets=offsets, scale=d**-0.5)
    got = flash_prefill.flash_prefill(q, k, v, offsets, scale=d**-0.5)
    check("flash_prefill bf16", got, ref, 3e-2)

    xf = np.asarray(k, np.float32)
    sc = np.maximum(np.abs(xf).max(-1) / 127.0, 1e-8)
    k8 = jnp.asarray(
        np.clip(np.round(xf / sc[..., None]), -127, 127).astype(np.int8)
    )
    ks = jnp.asarray(sc, jnp.bfloat16)
    vf = np.asarray(v, np.float32)
    vsc = np.maximum(np.abs(vf).max(-1) / 127.0, 1e-8)
    v8 = jnp.asarray(
        np.clip(np.round(vf / vsc[..., None]), -127, 127).astype(np.int8)
    )
    vs = jnp.asarray(vsc, jnp.bfloat16)
    kd = k8.astype(jnp.bfloat16) * ks[..., None]
    vd = v8.astype(jnp.bfloat16) * vs[..., None]
    ref8 = attention.sdpa_slab(q, kd, vd, q_offsets=offsets, scale=d**-0.5)
    got8 = flash_prefill.flash_prefill(
        q, k8, v8, offsets, scale=d**-0.5, k_scale=ks, v_scale=vs
    )
    check("flash_prefill int8", got8, ref8, 4e-2)


def append_checks():
    rng = np.random.default_rng(2)
    nl, b, hkv, rep, s, d = 2, 4, 8, 4, 512, 128
    layer = 1
    q = jnp.asarray(
        rng.standard_normal((b, 1, hkv * rep, d)), jnp.bfloat16
    )
    kn = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.bfloat16)
    kk = jnp.asarray(rng.standard_normal((nl, b, hkv, s, d)), jnp.bfloat16)
    vv = jnp.asarray(rng.standard_normal((nl, b, hkv, s, d)), jnp.bfloat16)
    lengths = jnp.asarray([0, 63, 256, 511], jnp.int32)
    cache = KVCache(k=kk, v=vv, lengths=lengths)
    ref_cache = cache.update_layer(layer, kn, vn)
    ref = attention.cached_attention(q, ref_cache, layer, scale=d**-0.5)
    out, k2, v2 = flash_append.flash_append_attend(
        q, kk, vv, lengths, kn, vn, layer=layer, scale=d**-0.5
    )
    check("flash_append bf16 out", out, ref, 3e-2)
    check_exact("flash_append bf16 k slab", k2, ref_cache.k)
    check_exact("flash_append bf16 v slab", v2, ref_cache.v)

    qc = QuantizedKVCache.init(nl, b, s, hkv, d)
    seed = jnp.asarray(
        rng.standard_normal((b, 384, hkv, d)), jnp.bfloat16
    )
    for l in range(nl):
        qc = qc.update_layer(l, seed, seed)
    qc = QuantizedKVCache(
        k=qc.k, v=qc.v, k_scale=qc.k_scale, v_scale=qc.v_scale,
        lengths=jnp.asarray([5, 64, 200, 384], jnp.int32),
    )
    ref_qc = qc.update_layer(layer, kn, vn)
    refq = attention.cached_attention(q, ref_qc, layer, scale=d**-0.5)
    outq, k2q, v2q, ks2, vs2 = flash_append.flash_append_attend(
        q, qc.k, qc.v, qc.lengths, kn, vn, layer=layer, scale=d**-0.5,
        cache_ks=qc.k_scale, cache_vs=qc.v_scale,
    )
    check("flash_append int8 out", outq, refq, 6e-2)
    check_exact("flash_append int8 k slab", k2q, ref_qc.k)
    check_exact("flash_append int8 v slab", v2q, ref_qc.v)
    check("flash_append int8 k scales", ks2, ref_qc.k_scale, 1e-2)
    check("flash_append int8 v scales", vs2, ref_qc.v_scale, 1e-2)


def ragged_checks():
    from mlx_parallm_tpu.ops import qmm_ragged

    rng = np.random.default_rng(3)
    e, k, n, rows = 4, 512, 1024, 96
    ws = jnp.asarray(rng.normal(size=(e, n, k)).astype(np.float32) * 0.05)
    packs = [quant.quantize(ws[i], 64, 4) for i in range(e)]
    nt = quant.choose_n_tile_expert(k, n, 4)
    wk3 = jnp.stack(
        [
            quant.tile_kernel(quant.kernel_pack(packs[i][0], 64, 4), nt)
            for i in range(e)
        ]
    )
    sk_bk = [
        quant.kernel_scale_mirrors(packs[i][1], packs[i][2], 4)
        for i in range(e)
    ]
    sk3 = jnp.stack([a for a, _ in sk_bk])
    bk3 = jnp.stack([b for _, b in sk_bk])
    x = jnp.asarray(
        rng.normal(size=(rows, k)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, e, size=(rows,)), jnp.int32)
    kw = k * 4 // 32
    tm = qmm_ragged.choose_tm(rows, kw, nt, k // 64, 4)
    layout = qmm_ragged.make_layout(ids, e, tm)
    x_pad = qmm_ragged.pad_rows(layout, x)
    y_pad = qmm_ragged.ragged_qmm_padded(
        x_pad, layout.e_of_tile, wk3, sk3, bk3,
        group_size=64, bits=4, tm=tm,
    )
    got = qmm_ragged.unpad_rows(layout, y_pad)
    # reference: per-row dense dequant matmul through the row's expert
    wdq = jnp.stack(
        [
            qmm.qmm(
                x, packs[i][0], packs[i][1], packs[i][2],
                group_size=64, bits=4, impl="dequant",
            )
            for i in range(e)
        ]
    )  # (E, rows, N)
    ref = jnp.take_along_axis(
        wdq.transpose(1, 0, 2), ids[:, None, None], axis=1
    )[:, 0]
    check("ragged moe qmm int4", got, ref, 2e-2)


def main():
    assert jax.default_backend() == "tpu", (
        "tpu_equiv_check must run on the TPU backend"
    )
    qmm_checks()
    flash_checks()
    prefill_checks()
    append_checks()
    try:
        ragged_checks()
    except (ImportError, AttributeError, TypeError) as e:
        print(f"ragged check skipped/adjust: {e}", flush=True)
        FAILURES.append(f"ragged harness error: {e}")
    if FAILURES:
        print("FAILURES:", FAILURES)
        return 1
    print("ALL TPU KERNEL EQUIVALENCE CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
