"""Serve CLI (parity: reference /root/reference/mlx_parallm/cli.py).

Usage: ``python -m mlx_parallm_tpu.cli --model-path <dir> [--port N] ...``
Flag names match the reference's ``mlx_parallm_serve`` surface.
"""

from __future__ import annotations

import argparse
import logging

from .server.main import ServerArgs, run_server

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mlx_parallm_serve")
    p.add_argument("--model-path", required=True, help="Model directory or HF repo id")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--lora-path", default=None, help="Adapter dir to load at startup")
    p.add_argument("--max-batch-size", type=int, default=8)
    p.add_argument("--batch-timeout", type=float, default=0.1)
    p.add_argument("--request-timeout-seconds", type=float, default=86400)
    p.add_argument("--max-concurrent-streams", type=int, default=4)
    p.add_argument("--scheduler", choices=["default", "continuous"], default="default")
    p.add_argument("--diverse-mode", action="store_true")
    p.add_argument("--max-context-length", type=int, default=32768)
    p.add_argument(
        "--kv-bits",
        type=int,
        choices=[8, 16],
        default=None,
        help="KV cache precision: 8 = INT8-quantized KV (half memory). "
        "Default: 8 for the continuous scheduler, 16 otherwise",
    )
    p.add_argument(
        "--num-slots",
        type=int,
        default=None,
        help="Continuous scheduler: decode slot count "
        "(default 2 x max-batch-size — oversubscribed so arrival bursts "
        "admit immediately)",
    )
    p.add_argument(
        "--slot-context-length",
        type=int,
        default=4096,
        help="Continuous scheduler: KV slab capacity per decode slot "
        "(slab memory scales with max-batch-size x this)",
    )
    p.add_argument(
        "--tp",
        type=int,
        default=None,
        help="Tensor-parallel degree: shard weights + KV heads over this "
        "many chips (default: all devices when --dp/--coordinator given, "
        "else 1)",
    )
    p.add_argument(
        "--dp",
        type=int,
        default=None,
        help="Data-parallel mesh axis (KV batch sharding)",
    )
    p.add_argument(
        "--coordinator",
        default=None,
        help="Multi-host coordinator address host:port "
        "(jax.distributed); host 0 serves HTTP, others follow",
    )
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument(
        "--warmup",
        action="store_true",
        help="Continuous scheduler: pre-compile admission + decode "
        "program buckets at startup so first live traffic never stalls "
        "behind an XLA compile (one-time per machine with the "
        "persistent compilation cache)",
    )
    p.add_argument(
        "--warmup-prompt-lens",
        default="128",
        help="Comma-separated prompt-length buckets to warm (with "
        "--warmup)",
    )
    return p


def args_from_namespace(ns: argparse.Namespace) -> ServerArgs:
    return ServerArgs(
        model_path=ns.model_path,
        host=ns.host,
        port=ns.port,
        lora_path=ns.lora_path,
        max_batch_size=ns.max_batch_size,
        batch_timeout=ns.batch_timeout,
        request_timeout_seconds=ns.request_timeout_seconds,
        max_concurrent_streams=ns.max_concurrent_streams,
        scheduler=ns.scheduler,
        diverse_mode=ns.diverse_mode,
        max_context_length=ns.max_context_length,
        kv_bits=ns.kv_bits,
        num_slots=ns.num_slots,
        slot_context_length=ns.slot_context_length,
        tp=ns.tp,
        dp=ns.dp,
        coordinator=ns.coordinator,
        num_processes=ns.num_processes,
        process_id=ns.process_id,
        warmup=ns.warmup,
        warmup_prompt_lens=tuple(
            int(x) for x in str(ns.warmup_prompt_lens).split(",") if x
        ),
    )


def cli_runner(argv=None) -> None:
    import os

    if os.environ.get("MLX_PARALLM_FORCE_CPU") == "1":
        # Test harness: run on the host CPU backend even when a TPU plugin is
        # registered (the axon sitecustomize pins JAX_PLATFORMS=axon).
        import jax

        jax.config.update("jax_platforms", "cpu")
    ns = build_parser().parse_args(argv)
    run_server(args_from_namespace(ns))


if __name__ == "__main__":
    cli_runner()
