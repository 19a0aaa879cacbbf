"""mlx_parallm_tpu: TPU-native parallel LLM serving + RL training framework."""

__version__ = "0.1.0"
