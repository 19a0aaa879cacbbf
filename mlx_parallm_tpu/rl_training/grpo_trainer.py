"""GRPO trainer: group-relative policy optimization over LoRA adapters.

Parity with the reference (reference:
/root/reference/mlx_parallm/rl_training/grpo_trainer.py): KL estimators
k3 / mse / abs (:198-207), sign-conditioned PPO clipping (:210-242), entropy
bonus (:310-314), optional EMA reference-adapter update (:333-351), per-step
adapter hot-reload into the serving model (:354-368), Adam on adapter params
only.

TPU-native redesign: per-token logprobs are a vectorized ``take_along_axis``
gather (the reference's known perf debt is a Python one-hot loop,
grpo_trainer.py:97-120); the whole update step — forward, loss, backward,
Adam — is ONE jitted function over bucketed static shapes; gradients exist
only for the adapter sub-tree (structural freeze), and the weight hot-swap is
a functional tree merge + version bump rather than in-place mutation under a
model-wide lock.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.loader import Model
from ..server import state as server_state
from .param_utils import merge_adapter_params, split_adapter_params
from .types import ScoredDataGroup

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class GRPOConfig:
    learning_rate: float = 1e-5
    kl_beta: float = 0.0
    kl_estimator: str = "k3"  # "k3" | "mse" | "abs"
    ref_ema: Optional[float] = None
    clip_ratio: float = 0.2
    entropy_weight: float = 0.0
    max_tokens: int = 1024
    adapter_format: str = "safetensors"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.jit
def publish_adapter_bf16(adapter: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Serving-dtype cast of the trained adapter tree as ONE program.

    The hot-swap contract (reference RL_TRAINER.md:762-765: adapter swap
    <10 ms) dies by a thousand dispatches if each rank-16 leaf is cast
    with its own ``astype`` — per-op dispatch latency through a TPU
    runtime is ~1-10 ms, and a 16-layer q/v adapter has 64+ leaves. Dict
    keys are static under jit, so the key-conditional cast compiles to a
    single fused program: one dispatch per publish, total device time
    microseconds."""
    return {
        k: v.astype(jnp.bfloat16)
        if v.dtype == jnp.float32 and k.endswith(("lora_a", "lora_b"))
        else v
        for k, v in adapter.items()
    }


def _collate(
    batch: List[ScoredDataGroup], pad_id: int = 0
) -> Dict[str, np.ndarray]:
    """Flatten ScoredDataGroups and right-pad to (B, T)
    (parity: reference :146-188)."""
    tokens: List[List[int]] = []
    masks: List[List[int]] = []
    advs: List[Optional[List[float]]] = []
    ref_lps: List[Optional[List[float]]] = []
    scores: List[float] = []
    for group in batch:
        g_tokens = group["tokens"]
        g_masks = group["masks"]
        g_scores = group["scores"]
        g_advs = group.get("advantages") or [None] * len(g_tokens)
        g_refs = group.get("ref_logprobs") or [None] * len(g_tokens)
        for i in range(len(g_tokens)):
            tokens.append(list(g_tokens[i]))
            masks.append(list(g_masks[i]))
            scores.append(float(g_scores[i]))
            advs.append(list(g_advs[i]) if g_advs[i] is not None else None)
            ref_lps.append(list(g_refs[i]) if g_refs[i] is not None else None)

    b = len(tokens)
    t = _round_up(max(len(r) for r in tokens), 64)
    tok = np.full((b, t), pad_id, dtype=np.int32)
    msk = np.zeros((b, t), dtype=np.float32)
    adv = np.zeros((b, t), dtype=np.float32)
    ref = np.zeros((b, t), dtype=np.float32)
    has_ref = np.zeros((b,), dtype=np.float32)
    for i in range(b):
        n = len(tokens[i])
        tok[i, :n] = tokens[i]
        msk[i, :n] = masks[i]
        if advs[i] is not None:
            m = min(len(advs[i]), t)
            adv[i, :m] = advs[i][:m]
        else:
            adv[i] = scores[i]  # sequence-level score broadcast
        if ref_lps[i] is not None:
            # Right-aligned heuristic (parity: reference :161-175): provider
            # logprobs cover the response suffix.
            r = np.asarray(ref_lps[i], dtype=np.float32)
            m = min(len(r), n)
            ref[i, n - m : n] = r[-m:]
            has_ref[i] = 1.0
    return {
        "tokens": tok,
        "masks": msk,
        "advantages": adv,
        "ref_logprobs": ref,
        "has_ref": has_ref,
    }


def _token_logprobs(apply_fn, params, tokens):
    """(B, T) per-token logprobs of the realized tokens (position 0 gets 0)
    and (B, T) per-position entropy, fully vectorized."""
    logits, _ = apply_fn(params, tokens, None)
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp_next = jnp.take_along_axis(
        lsm[:, :-1], tokens[:, 1:][..., None], axis=-1
    )[..., 0]
    lp = jnp.concatenate(
        [jnp.zeros((tokens.shape[0], 1), jnp.float32), lp_next], axis=1
    )
    probs = jnp.exp(lsm)
    ent_pos = -jnp.sum(probs * lsm, axis=-1)  # (B, T)
    ent = jnp.concatenate(
        [jnp.zeros((tokens.shape[0], 1), jnp.float32), ent_pos[:, :-1]], axis=1
    )
    return lp, ent


@functools.partial(
    jax.jit,
    static_argnames=("apply_fn", "kl_estimator", "clip_ratio", "kl_beta", "entropy_weight", "use_ref_params", "tx"),
)
def _grpo_update(
    apply_fn,
    adapter_flat,
    opt_state,
    frozen_flat,
    ref_adapter_flat,
    tokens,
    masks,
    advantages,
    provided_ref,
    has_ref,
    *,
    kl_estimator: str,
    clip_ratio: float,
    kl_beta: float,
    entropy_weight: float,
    use_ref_params: bool,
    tx: Any = None,
):
    def loss_fn(adapter):
        params = merge_adapter_params(adapter, frozen_flat)
        lp, ent = _token_logprobs(apply_fn, params, tokens)

        if use_ref_params:
            ref_params = merge_adapter_params(ref_adapter_flat, frozen_flat)
            ref_lp, _ = _token_logprobs(apply_fn, ref_params, tokens)
            ref_lp = jax.lax.stop_gradient(ref_lp)
            # Provider-supplied ref logprobs take precedence per row.
            ref_lp = jnp.where(has_ref[:, None] > 0, provided_ref, ref_lp)
        else:
            ref_lp = jnp.where(
                has_ref[:, None] > 0, provided_ref, jax.lax.stop_gradient(lp)
            )

        delta = lp - ref_lp
        ratio = jnp.exp(delta)
        clipped = jnp.where(
            advantages > 0,
            jnp.minimum(ratio, 1.0 + clip_ratio),
            jnp.maximum(ratio, 1.0 - clip_ratio),
        )
        pg = -advantages * clipped

        neg_delta = -delta  # ref_lp - lp
        if kl_estimator == "k3":
            kl = jnp.maximum(jnp.exp(neg_delta) - neg_delta - 1.0, 0.0)
        elif kl_estimator == "mse":
            kl = 0.5 * jnp.square(delta)
        else:  # "abs"
            kl = jnp.abs(delta)

        denom = jnp.maximum(jnp.sum(masks), 1.0)
        loss = (
            jnp.sum((pg + kl_beta * kl - entropy_weight * ent) * masks) / denom
        )

        clip_frac_hi = jnp.sum((ratio > 1.0 + clip_ratio) * masks) / denom
        clip_frac_lo = jnp.sum((ratio < 1.0 - clip_ratio) * masks) / denom
        aux = {
            "loss": loss,
            "mean_logp": jnp.sum(lp * masks) / denom,
            "kl": jnp.sum(kl * masks) / denom,
            "entropy": jnp.sum(ent * masks) / denom,
            "clip_frac_hi": clip_frac_hi,
            "clip_frac_lo": clip_frac_lo,
            "tokens": jnp.sum(masks),
        }
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(adapter_flat)
    updates, opt_state = tx.update(grads, opt_state, adapter_flat)
    adapter_flat = optax.apply_updates(adapter_flat, updates)
    return adapter_flat, opt_state, aux


@jax.jit
def _ema_update(ref_flat, policy_flat, ema: jnp.ndarray):
    return jax.tree_util.tree_map(
        lambda r, p: ema * r + (1.0 - ema) * p.astype(r.dtype), ref_flat, policy_flat
    )


class GRPOTrainer:
    """Shares the serving ``Model`` instance; updates adapter params in a
    functional swap each step (reference: grpo_trainer.py:123-368)."""

    def __init__(
        self,
        model: Model,
        tokenizer,
        config: GRPOConfig,
        *,
        ref_model: Optional[Model] = None,
        serving_record=None,
        checkpoint_dir: Optional[str] = None,
    ):
        self.model = model
        self.tokenizer = tokenizer
        self.config = config
        self.serving_record = serving_record
        self.checkpoint_dir = checkpoint_dir
        self.tx = optax.adam(config.learning_rate)

        adapter, frozen = split_adapter_params(model.params)
        if not adapter:
            raise ValueError("Model has no adapter params; run LoRA init first")
        # Train in fp32 master copies for stability.
        self._adapter = {
            k: v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v
            for k, v in adapter.items()
        }
        self._opt_state = self.tx.init(self._adapter)
        self._use_ref = config.ref_ema is not None or ref_model is not None
        if self._use_ref:
            self._ref_adapter = jax.tree_util.tree_map(
                lambda x: x, self._adapter
            )
        else:
            self._ref_adapter = self._adapter  # placeholder, unused
        self.step_count = 0

    def step(self, scored_batch: List[ScoredDataGroup]) -> Dict[str, float]:
        t0 = time.perf_counter()
        pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
        data = _collate(scored_batch, pad_id=pad_id)

        # Data-parallel sharding of the batch when the model lives on a mesh.
        mesh = getattr(self.model, "mesh", None)
        if mesh is not None and data["tokens"].shape[0] % mesh.shape["dp"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp_sh = NamedSharding(mesh, P("dp"))
            data = {
                k: jax.device_put(v, dp_sh) for k, v in data.items()
            }
        _, frozen = split_adapter_params(self.model.params)

        cfg = self.config
        self._adapter, self._opt_state, aux = _grpo_update(
            self.model.apply_fn(),
            self._adapter,
            self._opt_state,
            frozen,
            self._ref_adapter,
            jnp.asarray(data["tokens"]),
            jnp.asarray(data["masks"]),
            jnp.asarray(data["advantages"]),
            jnp.asarray(data["ref_logprobs"]),
            jnp.asarray(data["has_ref"]),
            kl_estimator=cfg.kl_estimator,
            clip_ratio=cfg.clip_ratio,
            kl_beta=cfg.kl_beta,
            entropy_weight=cfg.entropy_weight,
            use_ref_params=self._use_ref,
            tx=self.tx,
        )

        if self._use_ref and cfg.ref_ema is not None:
            self._ref_adapter = _ema_update(
                self._ref_adapter, self._adapter, jnp.float32(cfg.ref_ema)
            )

        # Hot-swap the updated adapter into the live serving model. The lock
        # only guards the registry mutation; decode engines pick up the new
        # tree at their next step (reference holds it across the whole Adam
        # update, grpo_trainer.py:327-329).
        with server_state.weight_update_lock:
            self.model.swap_params(
                merge_adapter_params(
                    publish_adapter_bf16(self._adapter), frozen
                )
            )

        self.step_count += 1
        metrics = {k: float(v) for k, v in jax.device_get(aux).items()}
        metrics["step_time_s"] = time.perf_counter() - t0
        metrics["step"] = self.step_count
        return metrics

    @property
    def adapter_params(self) -> Dict[str, jnp.ndarray]:
        return self._adapter

    def restore(self, step_dir: str) -> int:
        """Resume from a ``step_N`` checkpoint dir: reload fp32 adapter
        masters from the (already hot-swapped) model tree and the persisted
        Adam state if present. Returns the restored step number."""
        import os

        from . import checkpoint as ckpt
        from .param_utils import split_adapter_params as _split

        adapter, _ = _split(self.model.params)
        self._adapter = {
            k: v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v
            for k, v in adapter.items()
        }
        opt_state = ckpt.load_optimizer_state(step_dir)
        if opt_state is not None:
            try:
                self._opt_state = jax.tree_util.tree_map(
                    jnp.asarray, opt_state
                )
            except Exception:
                logger.warning(
                    "Optimizer state in %s incompatible; reinitializing", step_dir
                )
                self._opt_state = self.tx.init(self._adapter)
        else:
            self._opt_state = self.tx.init(self._adapter)
        if self._use_ref:
            self._ref_adapter = jax.tree_util.tree_map(lambda x: x, self._adapter)
        try:
            step = int(os.path.basename(step_dir.rstrip("/")).split("_")[1])
        except (IndexError, ValueError):
            step = 0
        self.step_count = step
        return step
