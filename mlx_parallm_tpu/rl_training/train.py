"""Unified RL trainer CLI: co-hosts the serving stack and trains in-process.

Parity: reference rl_training/train.py — launches the HTTP server in a daemon
thread of the SAME process (:55-67), shares the live model instance through
the registry, waits for load, applies/auto-inits LoRA (:111-136), optionally
keeps a frozen KL reference (here: an EMA adapter copy instead of a second
full model — lighter and equivalent for LoRA-only training), picks
Atropos/mock rollout provider (:144-158), then loops fetch → GRPO step →
periodic checkpoints (:256-315). ``--dry-run`` validates config only.

Usage: ``python -m mlx_parallm_tpu.rl_training.train --model-path <dir> ...``
"""

from __future__ import annotations

import argparse
import asyncio
import dataclasses
import logging
import threading
import time
from typing import Optional

logger = logging.getLogger(__name__)


def _launch_server_thread(args) -> threading.Thread:
    """Run the aiohttp server in a daemon thread, sharing this process's
    model registry (parity: reference train.py:55-67)."""
    from aiohttp import web

    from ..server.main import create_app

    def run():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        app = create_app(args)
        runner = web.AppRunner(app, handle_signals=False)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, args.host, args.port)
        loop.run_until_complete(site.start())
        loop.run_forever()

    th = threading.Thread(target=run, daemon=True, name="serve-thread")
    th.start()
    return th


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mlx_parallm_train")
    p.add_argument("--config", default=None, help="TOML config path")
    p.add_argument("--model-path", default=None)
    p.add_argument("--lora-path", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--kl-beta", type=float, default=None)
    p.add_argument("--kl-estimator", choices=["k3", "mse", "abs"], default=None)
    p.add_argument("--ref-ema", type=float, default=None)
    p.add_argument("--clip-ratio", type=float, default=None)
    p.add_argument("--entropy-weight", type=float, default=None)
    p.add_argument("--total-steps", type=int, default=None)
    p.add_argument("--checkpoint-interval", type=int, default=None)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--max-tokens", type=int, default=None)
    p.add_argument("--atropos-url", default=None)
    p.add_argument("--lora-rank", type=int, default=16)
    p.add_argument("--lora-layers", type=int, default=8)
    p.add_argument("--dry-run", action="store_true")
    p.add_argument(
        "--resume",
        action="store_true",
        help="resume from the latest step_N in --checkpoint-dir (adapter + optimizer state)",
    )
    p.add_argument("--max-batch-size", type=int, default=8)
    return p


def main(argv=None) -> int:
    import os

    if os.environ.get("MLX_PARALLM_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")

    logging.basicConfig(level=logging.INFO)
    ns = build_parser().parse_args(argv)

    from ..server import state as server_state
    from ..server.main import ServerArgs
    from . import checkpoint as ckpt
    from .atropos_client import AtroposClient, MockAtroposClient
    from .config import RLTrainingConfig, load_config
    from .grpo_trainer import GRPOConfig, GRPOTrainer
    from .lora_init import init_lora_if_needed
    from .param_utils import adapter_weights, has_lora_params
    from .weight_updater import apply_lora_update_for_record

    # Config: TOML base with CLI overrides (parity: reference train.py:78-86).
    tcfg = RLTrainingConfig()
    model_path = ns.model_path
    lora_path = ns.lora_path
    if ns.config:
        cfg = load_config(ns.config)
        tcfg = cfg.training
        model_path = model_path or cfg.model.path
        lora_path = lora_path or cfg.model.lora_path
    for field, attr in (
        ("learning_rate", "learning_rate"),
        ("kl_beta", "kl_beta"),
        ("kl_estimator", "kl_estimator"),
        ("ref_ema", "ref_ema"),
        ("clip_ratio", "clip_ratio"),
        ("entropy_weight", "entropy_weight"),
        ("total_steps", "total_steps"),
        ("checkpoint_interval", "checkpoint_interval"),
        ("checkpoint_dir", "checkpoint_dir"),
        ("max_tokens", "max_tokens"),
        ("atropos_url", "atropos_url"),
    ):
        val = getattr(ns, field)
        if val is not None:
            setattr(tcfg, attr, val)

    if not model_path:
        logger.error("--model-path (or [model].path in --config) is required")
        return 2

    if ns.dry_run:
        logger.info("Dry run OK: model=%s training=%s", model_path, tcfg)
        return 0

    server_args = ServerArgs(
        model_path=model_path,
        host=ns.host,
        port=ns.port,
        lora_path=lora_path,
        max_batch_size=ns.max_batch_size,
    )
    _launch_server_thread(server_args)

    # Wait for the co-hosted server to load the model.
    deadline = time.time() + 600
    record = None
    while time.time() < deadline:
        record = server_state.get_active_record()
        if record is not None:
            break
        time.sleep(0.5)
    if record is None:
        logger.error("Server did not load the model in time")
        return 1

    model = record.model_instance
    tokenizer = record.tokenizer_instance

    # Resume: point lora at the latest checkpoint before init logic runs.
    resume_dir = None
    if ns.resume:
        resume_dir = ckpt.latest_step_dir(tcfg.checkpoint_dir)
        if resume_dir:
            apply_lora_update_for_record(record, resume_dir)
            logger.info("Resuming from %s", resume_dir)

    # LoRA: explicit adapter already applied at load; else auto-init.
    if not has_lora_params(model.params):
        adapter_dir = init_lora_if_needed(
            model,
            tcfg.checkpoint_dir,
            rank=ns.lora_rank,
            num_layers=ns.lora_layers,
        )
        record.adapter_path = adapter_dir

    grpo_cfg = GRPOConfig(
        learning_rate=tcfg.learning_rate,
        kl_beta=tcfg.kl_beta,
        kl_estimator=tcfg.kl_estimator,
        ref_ema=tcfg.ref_ema,
        clip_ratio=tcfg.clip_ratio,
        entropy_weight=tcfg.entropy_weight,
        max_tokens=tcfg.max_tokens,
    )
    trainer = GRPOTrainer(
        model,
        tokenizer,
        grpo_cfg,
        serving_record=record,
        checkpoint_dir=tcfg.checkpoint_dir,
    )
    start_step = 0
    if resume_dir:
        start_step = trainer.restore(resume_dir)

    server_url = f"http://{ns.host}:{ns.port}"
    if tcfg.atropos_url:
        provider = AtroposClient(tcfg.atropos_url)
    else:
        provider = MockAtroposClient(server_url, model_path, tokenizer)

    async def train_loop():
        await provider.register(
            {
                "wandb_group": "mlx_parallm_tpu",
                "batch_size": tcfg.batch_size,
                "max_token_len": tcfg.max_tokens,
                "checkpoint_dir": tcfg.checkpoint_dir,
            }
        )
        for step_i in range(start_step + 1, tcfg.total_steps + 1):
            batch = await provider.fetch_batch()
            metrics = trainer.step(batch)
            logger.info("step %d: %s", step_i, metrics)
            if step_i % tcfg.checkpoint_interval == 0 or step_i == tcfg.total_steps:
                step_dir = ckpt.save_adapter_checkpoint(
                    tcfg.checkpoint_dir,
                    step_i,
                    adapter_weights(model.params),
                    source_adapter_dir=record.adapter_path,
                    optimizer_state=trainer._opt_state,
                )
                ckpt.save_checkpoint(
                    tcfg.checkpoint_dir, step_i, tcfg, adapter_path=step_dir
                )
                record.adapter_path = step_dir

    asyncio.run(train_loop())
    return 0


def train_cli_runner(argv=None) -> None:
    raise SystemExit(main(argv))


if __name__ == "__main__":
    train_cli_runner()
