"""Model loading: config.json + safetensors shards -> (Model, tokenizer).

TPU-native counterpart of the reference's ``load_model``/``load`` pipeline
(reference: /root/reference/mlx_parallm/utils.py:33-132,620-747). Behavior
matched: arch dispatch via config ``model_type`` with remapping, ``sanitize``
hooks, the ``{"quantization": {group_size, bits}}`` config contract with the
legacy per-layer ``"<path>.scales" in weights`` predicate, unknown-tensor
filtering, and LoRA adapter application at load.

Differences (TPU-first): weights land as jax arrays (bf16 by default for
float params) optionally already laid out with NamedSharding for a device
mesh; quantized layers keep the MLX-packed uint32 form and can materialize an
unpacked int8 mirror for the XLA grouped matmul path.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import logging
import os
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import models as model_registry
from ..ops import quant
from . import params as P
from .tokenizer_utils import TokenizerWrapper, load_tokenizer

logger = logging.getLogger(__name__)


def get_model_path(path_or_repo: str) -> Path:
    """Resolve a local model directory. Remote HF repos are resolved through
    ``huggingface_hub.snapshot_download`` when the environment allows network
    access (parity: reference utils.py:70-108)."""
    p = Path(path_or_repo)
    if p.exists():
        return p
    try:
        from huggingface_hub import snapshot_download

        return Path(
            snapshot_download(
                repo_id=path_or_repo,
                allow_patterns=[
                    "*.json", "*.safetensors", "*.py",
                    "tokenizer.model", "*.tiktoken", "*.txt",
                ],
            )
        )
    except Exception as e:
        raise FileNotFoundError(
            f"Model path {path_or_repo} not found locally and could not be "
            f"downloaded: {e}"
        ) from e


def load_config(model_path: Path) -> dict:
    with open(model_path / "config.json") as f:
        return json.load(f)


def _load_safetensors(model_path: Path) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    weight_files = sorted(glob.glob(str(model_path / "model*.safetensors")))
    if not weight_files:
        weight_files = sorted(glob.glob(str(model_path / "*.safetensors")))
    if not weight_files:
        raise FileNotFoundError(f"No safetensors found in {model_path}")
    weights: Dict[str, np.ndarray] = {}
    for wf in weight_files:
        with safe_open(wf, framework="np") as f:
            for k in f.keys():
                weights[k] = f.get_tensor(k)
    return weights


@dataclasses.dataclass
class Model:
    """A loaded model: static args + module fns + parameter pytree."""

    args: Any
    params: Dict[str, Any]
    module: Any
    config: dict
    model_path: Optional[Path] = None
    adapter_path: Optional[str] = None
    # Monotonic version bumped on every adapter/weight hot-swap so engines can
    # detect updates between decode steps (replaces the reference's in-place
    # mutation under weight_update_lock).
    version: int = 0

    @property
    def quantization(self) -> Optional[dict]:
        return self.config.get("quantization")

    @property
    def num_layers(self) -> int:
        return len(self.params["model"]["layers"])

    def n_kv_heads(self) -> int:
        return self.module.n_kv_heads(self.args)

    def head_dim(self) -> int:
        return self.module.head_dim(self.args)

    def apply_fn(self) -> Callable:
        """Pure (params, tokens, cache) -> (logits, cache) for jit."""
        args, module = self.args, self.module
        def fn(params, tokens, cache):
            return module.apply(args, params, tokens, cache)
        return fn

    def apply_fn_hidden(self) -> Callable:
        """Pure (params, tokens, cache) -> (hidden, cache) (pre-lm_head)."""
        args, module = self.args, self.module
        def fn(params, tokens, cache):
            return module.apply(args, params, tokens, cache, return_hidden=True)
        return fn

    def swap_params(self, new_params: Dict[str, Any]):
        self.params = new_params
        self.version += 1


def _is_float(arr: np.ndarray) -> bool:
    return np.issubdtype(arr.dtype, np.floating)


def load_model(
    model_path: Path,
    *,
    dtype=jnp.bfloat16,
    mirror_int8: bool = True,
    shardings: Optional[Dict[str, Any]] = None,
    n_shards: int = 1,
    quant_layout: Optional[str] = None,
) -> Model:
    """``n_shards`` is the intended tensor-parallel degree: the tiled
    fused-kernel layout is chosen so its tile axis divides evenly across
    ``tp`` shards (otherwise ``shard_params`` would have to replicate the
    largest weights on every chip).

    ``quant_layout="column"`` (or env ``MLX_PARALLM_QUANT_LAYOUT=column``)
    REQUANTIZES every 2D linear to per-COLUMN scales at load time (G = 1,
    group = the whole input dim): the fused kernel then runs scale-free at
    its measured no-scale ceiling (~680 vs ~500 GB/s, probe_qmm_decompose)
    with the one scale per output column folded into the XLA epilogue.
    This is an accuracy/speed trade — per-column INT4 is coarser than the
    wire format's group-64 (delta quantified in tests/test_quant_quality)
    — and is therefore opt-in; the default keeps MLX checkpoint parity.
    Embeddings and MoE expert stacks keep the wire format."""
    if quant_layout is None:
        quant_layout = os.environ.get("MLX_PARALLM_QUANT_LAYOUT")
    config = load_config(model_path)
    model_type = config.get("model_type", "llama")
    module = model_registry.get_model_module(model_type)
    args = module.ModelArgs.from_dict(config)

    raw = _load_safetensors(model_path)
    raw = module.sanitize(raw)

    qz = config.get("quantization")
    flat: Dict[str, jnp.ndarray] = {}
    for name, arr in raw.items():
        if _is_float(arr):
            flat[name] = jnp.asarray(arr, dtype=dtype)
        else:
            flat[name] = jnp.asarray(arr)

    if qz and mirror_int8:
        bits = int(qz.get("bits", 4))
        gs = int(qz.get("group_size", 64))
        on_tpu = jax.default_backend() == "tpu"
        for name in list(flat.keys()):
            # For each packed linear build the fast-path mirror: on TPU the
            # fused-kernel layout ("wk", consumed by the Pallas dequant-matmul
            # when shapes align), otherwise an unpacked int8 mirror ("q8") for
            # the XLA grouped matmul. Quantized embeddings keep the packed
            # form for the gather path AND get the TPU kernel mirror so the
            # tied-embedding lm_head projection (embedding_as_linear) runs
            # the fused kernel instead of dequantizing (V, H) every step —
            # but skip the int8 mirror (it would double embedding memory
            # for a matmul only the TPU path cares about).
            if name.endswith(".weight") and name[: -len(".weight")] + ".scales" in flat:
                is_embedding = "embed_tokens" in name
                if is_embedding and jax.default_backend() != "tpu":
                    continue
                base = name[: -len(".weight")]
                arr = flat[name]
                gs_l = gs
                if (
                    quant_layout == "column"
                    and arr.ndim == 2
                    and not is_embedding
                ):
                    # Requantize to per-column scales (see docstring). The
                    # fp32 reconstruction is transient, one linear at a
                    # time.
                    k_l = arr.shape[1] * (32 // bits)
                    w_full = quant.dequantize(
                        arr, flat[base + ".scales"],
                        flat[base + ".biases"], gs, bits,
                        dtype=jnp.float32,
                    )
                    arr, s_c, b_c = quant.quantize(w_full, k_l, bits)
                    del w_full
                    flat[name] = arr
                    flat[base + ".scales"] = s_c
                    flat[base + ".biases"] = b_c
                    gs_l = k_l
                built = False
                if on_tpu and arr.ndim == 2:
                    from .. import ops as _ops  # noqa: F401
                    from ..ops import qmm_pallas

                    n, kw_m = arr.shape
                    k = kw_m * (32 // bits)
                    probe = jnp.zeros((1, k), jnp.bfloat16)
                    # plan_n_tile may PAD vocab-sized heads up to a large
                    # tile (nt=256 blocks stream at a fraction of peak).
                    nt, n_pad = quant.plan_n_tile(
                        k, n, bits, n_shards=n_shards, group_size=gs_l
                    )
                    if nt is not None:
                        pk, ps, pb = quant.pad_quantized_rows(
                            arr,
                            flat[base + ".scales"],
                            flat[base + ".biases"],
                            n_pad,
                        )
                        wk = quant.tile_kernel(
                            quant.kernel_pack(pk, gs_l, bits), nt
                        )
                        if qmm_pallas.supported(probe, wk, ps, gs_l, bits):
                            flat[base + ".wk"] = wk
                            if n_pad != n:
                                # Mirrors must match the padded width; the
                                # post-pass would build them from the
                                # original (unpadded) scale planes.
                                (
                                    flat[base + ".sk"],
                                    flat[base + ".bk"],
                                ) = quant.kernel_scale_mirrors(ps, pb, bits)
                            built = True
                if not built and arr.ndim == 2 and not is_embedding:
                    flat[base + ".q8"] = quant.unpack(arr, bits)
                if arr.ndim == 3:
                    # Stacked MoE expert weights (E, N, Kw packed). Build
                    # the per-expert fast-path mirror consumed by
                    # models/switch_layers's grouped dispatch: tiled
                    # fused-kernel layout on TPU, unpacked int8 otherwise.
                    if on_tpu:
                        from ..ops import qmm_pallas

                        e_cnt, n, kw_m = arr.shape
                        k = kw_m * (32 // bits)
                        probe = jnp.zeros((1, k), jnp.bfloat16)
                        # Expert stacks prefer a ragged-kernel-feasible
                        # tile (whole-K block) over the largest one.
                        nt = quant.choose_n_tile_expert(
                            k, n, bits, n_shards=n_shards, group_size=gs
                        )
                        if nt is not None:
                            wk3 = jnp.stack(
                                [
                                    quant.tile_kernel(
                                        quant.kernel_pack(arr[e], gs, bits), nt
                                    )
                                    for e in range(e_cnt)
                                ]
                            )
                            if qmm_pallas.supported(
                                probe, wk3[0], flat[base + ".scales"][0],
                                gs, bits,
                            ):
                                flat[base + ".wk3"] = wk3
                                built = True
                    if not built:
                        flat[base + ".q8"] = quant.unpack(arr, bits)

    nested = P.unflatten(flat)
    if qz and mirror_int8 and jax.default_backend() == "tpu":
        _fuse_layer_projections(
            nested, int(qz.get("group_size", 64)), int(qz.get("bits", 4)),
            n_shards=n_shards,
        )
        _add_scale_mirrors(nested, int(qz.get("bits", 4)))
    model = Model(args=args, params=nested, module=module, config=config, model_path=model_path)
    logger.info(
        "Loaded %s (%s): %d layers, quantization=%s",
        model_path,
        model_type,
        model.num_layers,
        qz,
    )
    return model


def _add_scale_mirrors(node, bits: int) -> None:
    """Attach pre-transposed (G, N) scale/bias mirrors ("sk"/"bk") next to
    every fused-kernel weight ("wk") so the per-call (N, G) -> (G, N)
    relayout stays off the decode hot path (quant.kernel_scale_mirrors)."""
    if isinstance(node, dict):
        if "wk" in node and "scales" in node and "sk" not in node:
            node["sk"], node["bk"] = quant.kernel_scale_mirrors(
                node["scales"], node["biases"], bits
            )
        if "wk3" in node and "scales" in node and "sk3" not in node:
            # Stacked MoE expert mirrors for the ragged grouped kernel.
            import jax.numpy as _jnp

            pairs = [
                quant.kernel_scale_mirrors(
                    node["scales"][e], node["biases"][e], bits
                )
                for e in range(node["scales"].shape[0])
            ]
            node["sk3"] = _jnp.stack([a for a, _ in pairs])
            node["bk3"] = _jnp.stack([b for _, b in pairs])
        for v in node.values():
            _add_scale_mirrors(v, bits)
    elif isinstance(node, (list, tuple)):
        for v in node:
            _add_scale_mirrors(v, bits)


def _fuse_layer_projections(
    nested: Dict[str, Any], gs: int, bits: int, n_shards: int = 1
) -> None:
    """Fuse q/k/v and gate/up fused-kernel weights per layer (one Pallas
    launch instead of three/two). The fused dict carries wk/scales/biases;
    the original per-projection dicts keep their packed weights (checkpoint
    fidelity, dequant fallback) and any LoRA leaves (applied post-hoc by the
    model's fused path)."""
    from ..ops import qmm_pallas

    layers = nested.get("model", {}).get("layers")
    if not layers:
        return
    probe_dtype = jnp.bfloat16

    def fuse(parent: Dict[str, Any], names, fused_name: str):
        parts = [parent.get(n) for n in names]
        if any(p is None or "wk" not in p for p in parts):
            return
        # wk's are tiled (T, Kw, NT): untile, concatenate along N, retile for
        # the fused width. A part whose kernel was PADDED (plan_n_tile) is
        # sliced back to its true width first — fusing the padded halves
        # against the unpadded scale planes would misalign the epilogue
        # (measured: 704-wide ffn halves padded to 768 crashed prefill with
        # a (…,1536)+(…,1408) add). If the unpadded fused width is not
        # tileable, fusion is skipped and the per-projection padded path —
        # which slices per-linear — handles it correctly.
        wk2 = jnp.concatenate(
            [
                quant.untile_kernel(p["wk"])[:, : p["scales"].shape[0]]
                for p in parts
            ],
            axis=1,
        )  # (Kw, N_total)
        scales = jnp.concatenate([p["scales"] for p in parts], axis=0)
        biases = jnp.concatenate([p["biases"] for p in parts], axis=0)
        k = wk2.shape[0] * (32 // bits)
        n_total = wk2.shape[1]
        nt = quant.choose_n_tile(
            k, n_total, bits, n_shards=n_shards, group_size=gs
        )
        if nt is None:
            return
        wk = quant.tile_kernel(wk2, nt)
        probe = jnp.zeros((1, k), probe_dtype)
        if not qmm_pallas.supported(probe, wk, scales, gs, bits):
            return
        parent[fused_name] = {"wk": wk, "scales": scales, "biases": biases}
        for p in parts:
            p.pop("wk", None)

    for layer in layers:
        attn = layer.get("self_attn", {})
        fuse(attn, ("q_proj", "k_proj", "v_proj"), "qkv_proj")
        mlp = layer.get("mlp", {})
        fuse(mlp, ("gate_proj", "up_proj"), "gate_up_proj")


def load(
    path_or_repo: str,
    *,
    adapter_path: Optional[str] = None,
    dtype=jnp.bfloat16,
    mirror_int8: bool = True,
    n_shards: int = 1,
    quant_layout: Optional[str] = None,
) -> Tuple[Model, TokenizerWrapper]:
    """Load model + tokenizer, optionally applying a LoRA adapter
    (parity: reference utils.py:711-747)."""
    model_path = get_model_path(path_or_repo)
    model = load_model(
        model_path, dtype=dtype, mirror_int8=mirror_int8, n_shards=n_shards,
        quant_layout=quant_layout,
    )
    tokenizer = load_tokenizer(str(model_path))
    if adapter_path:
        from ..rl_training import weight_updater

        weight_updater.apply_lora_update(model, adapter_path)
        model.adapter_path = adapter_path
    return model, tokenizer
