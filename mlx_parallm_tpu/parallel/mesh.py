"""Device mesh + tensor-parallel sharding rules.

This is the capability the reference lacks entirely (SURVEY §2.7: no
DP/TP/PP of any kind) and the north star requires: weights and KV cache
tensor-sharded across chips via ``jax.sharding`` Mesh + NamedSharding, with
XLA inserting the collectives (all-gather for column-parallel outputs, psum
for row-parallel partial sums) under SPMD propagation.

Sharding rules (Megatron-style, per transformer block):
  * column-parallel (shard output features over ``tp``): q/k/v_proj,
    gate/up_proj, embed_tokens (vocab), lm_head (vocab)
  * row-parallel (shard input features over ``tp``): o_proj, down_proj —
    for quantized layers both the packed words axis and the scales/biases
    group axis shard over ``tp`` (group_size must divide the per-shard K)
  * replicated: norms, biases, LoRA adapters (tiny)
  * KV cache: heads over ``tp``, batch over ``dp``
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import params as Pm

logger = logging.getLogger(__name__)


def make_mesh(
    tp: Optional[int] = None,
    dp: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Create a (dp, tp) mesh over the available devices.

    Defaults: all devices on the ``tp`` axis (the right default for serving a
    large model on one slice)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None and dp is None:
        tp, dp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


_COL_PARALLEL = re.compile(
    r"(q_proj|k_proj|v_proj|gate_proj|up_proj|qkv_proj|gate_up_proj)$"
)
_ROW_PARALLEL = re.compile(r"(o_proj|down_proj)$")
_VOCAB_PARALLEL = re.compile(r"(embed_tokens|lm_head)$")


def partition_spec_for(name: str) -> P:
    """PartitionSpec for one flat param name (e.g.
    ``model.layers.0.self_attn.q_proj.weight``)."""
    parts = name.rsplit(".", 1)
    if len(parts) != 2:
        return P()
    prefix, leaf = parts
    if leaf in ("lora_a", "lora_b", "lora_scale", "bias"):
        return P()  # adapters + biases replicated (tiny)
    if leaf in ("wk3", "sk3", "bk3"):
        # Stacked MoE expert mirrors (E, ...): shard the expert axis
        # (within-mesh expert parallelism), matching the (E, N, G) scales.
        return P("tp")
    if _COL_PARALLEL.search(prefix) or _VOCAB_PARALLEL.search(prefix):
        # weight (N, K[,packed]) / scales (N, G) / q8 (N, K): shard N.
        # "wk" tiled fused-kernel layout is (T, Kw, NT) with tiles laid out
        # along N: shard the tile axis. "sk"/"bk" mirrors are (G, N): N is
        # axis 1.
        if leaf == "wk":
            return P("tp", None, None)
        if leaf in ("sk", "bk"):
            return P(None, "tp")
        return P("tp", None)
    if _ROW_PARALLEL.search(prefix):
        # weight (N, K): shard K; scales/biases (N, G): shard G (groups live
        # along K); q8 (N, K): shard K; "wk" (T, Kw, NT): shard Kw (axis 1);
        # "sk"/"bk" (G, N): G is axis 0.
        if leaf == "wk":
            return P(None, "tp", None)
        if leaf in ("sk", "bk"):
            return P("tp", None)
        return P(None, "tp")
    return P()


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put every leaf with its TP sharding. Leaves whose sharded axis
    does not divide evenly fall back to replication (with a log warning)."""
    flat = Pm.flatten(params)
    out = {}
    tp = mesh.shape["tp"]
    for name, arr in flat.items():
        spec = partition_spec_for(name)
        # Validate divisibility; replicate when it doesn't divide.
        ok = True
        for axis, axis_name in enumerate(spec):
            if axis_name == "tp" and arr.ndim > axis and arr.shape[axis] % tp != 0:
                ok = False
        if not ok:
            logger.warning(
                "Replicating %s %s (not divisible by tp=%d)", name, arr.shape, tp
            )
            spec = P()
        out[name] = jax.device_put(arr, NamedSharding(mesh, spec))
    return Pm.unflatten(out)


def kv_cache_sharding(mesh: Mesh, batch: int, n_kv_heads: int) -> NamedSharding:
    """(L, B, H_kv, S, D): batch over dp, heads over tp — each axis only when
    it divides evenly."""
    dp_axis = "dp" if batch % mesh.shape["dp"] == 0 else None
    tp_axis = "tp" if n_kv_heads % mesh.shape["tp"] == 0 else None
    return NamedSharding(mesh, P(None, dp_axis, tp_axis, None, None))


def shard_cache(cache, mesh: Mesh):
    """Shard any KV-slab dataclass (KVCache / QuantizedKVCache): 5D slabs
    (L, B, H, S, D) put batch over dp + heads over tp, 4D per-head scale
    planes (L, B, H, S) likewise, everything else replicated."""
    import dataclasses as _dc

    n_kv_heads = cache.k.shape[2]
    kv_sh = kv_cache_sharding(mesh, cache.batch_size, n_kv_heads)
    dp_axis = "dp" if cache.batch_size % mesh.shape["dp"] == 0 else None
    tp_axis = "tp" if n_kv_heads % mesh.shape["tp"] == 0 else None
    scale_sh = NamedSharding(mesh, P(None, dp_axis, tp_axis, None))
    rep = NamedSharding(mesh, P())
    updates = {}
    for f in _dc.fields(cache):
        arr = getattr(cache, f.name)
        if f.name == "lengths":
            updates[f.name] = jax.device_put(arr, rep)
        elif arr.ndim == 5:
            updates[f.name] = jax.device_put(arr, kv_sh)
        elif arr.ndim == 4:
            updates[f.name] = jax.device_put(arr, scale_sh)
        else:
            updates[f.name] = jax.device_put(arr, rep)
    return _dc.replace(cache, **updates)


def shard_model(model, mesh: Mesh) -> None:
    """Reshard a loaded Model's params in place for the mesh."""
    model.params = shard_params(model.params, mesh)
    model.mesh = mesh
    model.version += 1
