"""Immutable typed configuration for cartnet_tpu.

The reference uses a global mutable yacs ``cfg`` singleton populated by argparse
(``/root/reference/main.py:156-191``) and read at call time from every module.
Here the configuration is an immutable dataclass passed explicitly; nothing in
the compute path reads global state, so everything stays jit/pjit friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters (reference defaults: /root/reference/main.py:140-152)."""

    name: str = "cartnet"  # cartnet | ecomformer | icomformer
    dim_in: int = 256
    dim_rbf: int = 64
    num_layers: int = 4
    radius: float = 5.0
    invariant: bool = False
    use_temperature: bool = True
    use_envelope: bool = True
    use_atom_types: bool = True
    cholesky: bool = True  # Cholesky ADP head vs scalar head
    # numerics
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32  # set bfloat16 for TPU speed runs
    bn_momentum: float = 0.1  # PyTorch BatchNorm1d default
    bn_eps: float = 1e-5
    # rematerialize each message-passing layer in the backward pass: trades
    # recompute FLOPs for HBM traffic/memory of the [E, 2d] edge intermediates
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset / batching configuration.

    Reference: dataset flags in /root/reference/main.py:127-145; unlike the
    reference's dynamic PyG batching, we pad to static shapes for XLA.
    """

    name: str = "jarvis"  # ADP | jarvis | megnet | synthetic
    path: str = "./datasets"
    target: str = "formation_energy_peratom"
    radius: float = 5.0
    max_neighbors: int = -1  # -1 = uncapped (CartNet); 25 for Comformers
    batch_size: int = 64
    augment: bool = False
    use_hydrogens: bool = True
    standarize_temp: bool = True
    optimize_cell: bool = False  # lattice canonicalization (iComformer)
    # static-shape padding policy: pad nodes/edges per batch to these sizes
    max_nodes: int = 1024
    max_edges: int = 16384
    max_graphs: int = 64  # = batch_size (one pad graph slot is added on top)
    # size-quantile bucketing: each bucket gets its own pad shapes (one XLA
    # compilation per bucket) — bounds pad waste from heavy size tails.
    # Bucket boundaries never share a dp super-batch (runner.ShardedPipeline).
    buckets: int = 1
    # chunked single-device execution (parallel/chunk.py): re-lay each batch
    # into K member-major chunks and vmap the kernels over them — bounds the
    # window kernels' VMEM at any batch size (the batch-64 jarvis/megnet
    # configs). 1 = off.
    chunks: int = 1


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Optimizer/schedule config (reference: main.py:136-139, train/train.py:59)."""

    lr: float = 1e-3
    max_epoch: int = 50
    warmup: float = 0.01  # OneCycle pct_start
    batch_accumulation: int = 1
    loss: str = "MAE"  # MAE | MSE
    # fuse K micro-steps into one lax.scan device launch (0 = per-batch
    # dispatch). Removes per-step dispatch latency (~25 ms/step through a
    # remote-tunnel runtime); exact accumulation semantics preserved.
    fused_steps: int = 0
    # PyTorch OneCycleLR defaults mirrored
    div_factor: float = 25.0
    final_div_factor: float = 1e4
    cycle_momentum: bool = True
    base_momentum: float = 0.85
    max_momentum: float = 0.95
    grad_clip: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout: data-parallel x edge-parallel axes."""

    dp: int = 1  # data parallel (shard the graph batch)
    ep: int = 1  # edge/graph-partition parallel (shard edges, psum node aggregates)
    axis_dp: str = "dp"
    axis_ep: str = "ep"
    # halo mode: shard NODES over ep too (parallel/halo.py); per-layer comms
    # become one boundary-atom all_to_all instead of a full [N,d] all-reduce
    halo: bool = False
    # static per-owner halo row cap; None = n_per (always feasible worst case)
    halo_max: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class GuardConfig:
    """Failure detection / elastic recovery (train/guard.py; SURVEY §5 —
    subsystem the reference lacks entirely)."""

    enabled: bool = True         # device-side non-finite step skip + counter
    max_bad_fraction: float = 0.5  # epoch bad-step fraction triggering rollback
    max_retries: int = 2         # checkpoint rollbacks before giving up
    heartbeat_path: Optional[str] = None  # atomic liveness file (None = off)
    heartbeat_interval: float = 30.0


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    guard: GuardConfig = dataclasses.field(default_factory=GuardConfig)
    seed: int = 0
    name: str = "CartNet"
    run_dir: str = "results"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
