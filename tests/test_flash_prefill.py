"""Flash prefill kernel tests (Pallas interpret mode on CPU) vs the XLA
slab attention reference."""

import numpy as np

import jax.numpy as jnp

from mlx_parallm_tpu.ops import attention, flash_prefill


def _mk(b, t, hkv, rep, s, d, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, hkv * rep, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    return q, k, v


def _err(a, b):
    return np.abs(
        np.asarray(a, np.float32) - np.asarray(b, np.float32)
    ).max()


def test_prefill_matches_sdpa_gqa():
    b, t, hkv, rep, s, d = 2, 128, 4, 2, 512, 128
    q, k, v = _mk(b, t, hkv, rep, s, d)
    offsets = jnp.asarray([0, 300], jnp.int32)
    ref = attention.sdpa_slab(q, k, v, q_offsets=offsets, scale=d**-0.5)
    out = flash_prefill.flash_prefill(
        q, k, v, offsets, scale=d**-0.5, interpret=True
    )
    assert _err(ref, out) < 0.05
    assert flash_prefill.supported(q, k, offsets)


def test_prefill_int8_kv():
    b, t, hkv, rep, s, d = 2, 64, 2, 4, 256, 128
    q, k, v = _mk(b, t, hkv, rep, s, d, seed=1)
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    ks = np.maximum(np.abs(kf).max(-1) / 127.0, 1e-8)
    vs = np.maximum(np.abs(vf).max(-1) / 127.0, 1e-8)
    k8 = jnp.asarray(
        np.clip(np.round(kf / ks[..., None]), -127, 127).astype(np.int8)
    )
    v8 = jnp.asarray(
        np.clip(np.round(vf / vs[..., None]), -127, 127).astype(np.int8)
    )
    ksb = jnp.asarray(ks, jnp.bfloat16)
    vsb = jnp.asarray(vs, jnp.bfloat16)
    kd = k8.astype(jnp.bfloat16) * ksb[..., None]
    vd = v8.astype(jnp.bfloat16) * vsb[..., None]
    offsets = jnp.asarray([100, 192], jnp.int32)
    ref = attention.sdpa_slab(q, kd, vd, q_offsets=offsets, scale=d**-0.5)
    out = flash_prefill.flash_prefill(
        q, k8, v8, offsets, scale=d**-0.5,
        k_scale=ksb, v_scale=vsb, interpret=True,
    )
    assert _err(ref, out) < 0.06


def test_prefill_softcap_window():
    b, t, hkv, rep, s, d = 2, 64, 2, 2, 512, 128
    q, k, v = _mk(b, t, hkv, rep, s, d, seed=2)
    offsets = jnp.asarray([0, 440], jnp.int32)
    kw = dict(logit_softcap=30.0, sliding_window=128)
    ref = attention.sdpa_slab(
        q, k, v, q_offsets=offsets, scale=d**-0.5, **kw
    )
    out = flash_prefill.flash_prefill(
        q, k, v, offsets, scale=d**-0.5, interpret=True, **kw
    )
    assert _err(ref, out) < 0.05


def test_prefill_zero_offset_first_chunk():
    # First chunk of a fresh batch: offsets 0, queries attend only within
    # the chunk's own (already-written) slab region.
    b, t, hkv, rep, s, d = 2, 64, 2, 1, 256, 128
    q, k, v = _mk(b, t, hkv, rep, s, d, seed=3)
    offsets = jnp.zeros((b,), jnp.int32)
    ref = attention.sdpa_slab(q, k, v, q_offsets=offsets, scale=d**-0.5)
    out = flash_prefill.flash_prefill(
        q, k, v, offsets, scale=d**-0.5, interpret=True
    )
    assert _err(ref, out) < 0.05


def test_supported_gate():
    q, k, _ = _mk(2, 128, 2, 2, 256, 128)
    offsets = jnp.zeros((2,), jnp.int32)
    assert flash_prefill.supported(q, k, offsets)
    # decode queries (T == 1) not this kernel's job
    q1 = jnp.zeros((2, 1, 4, 128), jnp.bfloat16)
    assert not flash_prefill.supported(q1, k, offsets)
    # T not a multiple of the T block
    q2 = jnp.zeros((2, 96, 4, 128), jnp.bfloat16)
    assert not flash_prefill.supported(q2, k, offsets)
