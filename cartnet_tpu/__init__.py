"""cartnet_tpu: TPU-native crystal-GNN framework (CartNet / e-iComformer).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
imatge-upc/CartNet: static-shape padded graph batching, deterministic segment
aggregation, masked normalization, pjit/shard_map multi-chip parallelism.
"""
from cartnet_tpu.config import Config, ModelConfig, DataConfig, OptimConfig, ParallelConfig

__version__ = "0.1.0"
