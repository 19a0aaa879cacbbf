"""TOML training config (parity: reference rl_training/config.py:12-79)."""

from __future__ import annotations

import dataclasses
import tomllib
from typing import Optional


@dataclasses.dataclass
class ServerConfig:
    host: str = "127.0.0.1"
    port: int = 8000
    max_batch_size: int = 8
    batch_timeout: float = 0.1
    scheduler: str = "default"


@dataclasses.dataclass
class ModelConfig:
    path: str = ""
    lora_path: Optional[str] = None


@dataclasses.dataclass
class RLTrainingConfig:
    algorithm: str = "grpo"
    learning_rate: float = 1e-5
    batch_size: int = 8
    update_epochs: int = 1
    kl_beta: float = 0.0
    kl_estimator: str = "k3"
    ref_ema: Optional[float] = None
    entropy_weight: float = 0.0
    clip_ratio: float = 0.2
    total_steps: int = 100
    checkpoint_interval: int = 10
    checkpoint_dir: str = "checkpoints"
    max_tokens: int = 1024
    atropos_url: Optional[str] = None


@dataclasses.dataclass
class TrainConfig:
    server: ServerConfig = dataclasses.field(default_factory=ServerConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    training: RLTrainingConfig = dataclasses.field(default_factory=RLTrainingConfig)


def _fill(dc_cls, data: dict):
    fields = {f.name for f in dataclasses.fields(dc_cls)}
    return dc_cls(**{k: v for k, v in data.items() if k in fields})


def load_config(path: str) -> TrainConfig:
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    return TrainConfig(
        server=_fill(ServerConfig, raw.get("server", {})),
        model=_fill(ModelConfig, raw.get("model", {})),
        training=_fill(RLTrainingConfig, raw.get("training", {})),
    )
