"""Benchmark: CartNet training-step throughput in edges/sec/chip.

ADP-scale workload (avg 194 atoms/crystal, radius 5.0 — reference README.md:95)
on the flagship config (dim 256, rbf 64, 4 layers, Cholesky head, batch 4 like
scripts/train_cartnet_adp.sh). The reference publishes no throughput numbers
(SURVEY.md §6), so vs_baseline compares against the per-edge-MLP roofline:
fwd+bwd ≈ 3x fwd FLOPs of 2 edge-level [E,d]x[d,d] GEMMs + 4 node-level
[N,d]x[d,2d]-equivalent GEMMs per layer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.data.batching import collate
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        make_steps)

    dim = 256
    cfg = Config(
        model=ModelConfig(dim_in=dim, dim_rbf=64, num_layers=4, cholesky=True),
        data=DataConfig(max_nodes=1024, max_edges=65536, max_graphs=4),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1))

    recs = synthetic_dataset(8, mean_atoms=194, radius=5.0, adp=True, seed=0)
    batches = [collate(recs[i * 4:(i + 1) * 4], cfg.data.max_nodes,
                       cfg.data.max_edges, cfg.data.max_graphs)
               for i in range(2)]
    real_edges = int(np.asarray(batches[0].edge_mask).sum())
    real_nodes = int(np.asarray(batches[0].node_mask).sum())

    opt = build_optimizer(cfg, 100)
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    micro, update, _ = make_steps(cfg, cartnet_apply, opt)

    # warmup / compile
    for b in batches:
        state, _ = micro(state, b)
        state = update(state)
    jax.block_until_ready(state.params)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        state, _ = micro(state, batches[i % 2])
        state = update(state)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    edges_per_sec = real_edges * iters / dt

    # speed-of-light estimate for one fused train step on this chip:
    # per layer fwd: edge GEMMs 2x[E,d]x[d,d] + node GEMMs 2x[N,d]x[d,d]
    # (+ encoder/head, minor). bwd ~ 2x fwd. Use measured peak via device kind.
    layers = cfg.model.num_layers
    flops_fwd = layers * 2 * 2 * dim * dim * (real_edges + real_nodes)
    flops_step = 3 * flops_fwd
    peak = _peak_flops(jax.devices()[0])
    sol_edges_per_sec = real_edges / (flops_step / peak)

    print(json.dumps({
        "metric": "edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / sol_edges_per_sec, 4),
    }))


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    # f32 dense peak; bf16 would be ~2x
    table = {
        "tpu v5 lite": 98e12,   # v5e bf16 197 TFLOPs -> ~98 f32-ish effective
        "tpu v5": 197e12,
        "tpu v4": 137.5e12,
        "tpu v6": 459e12,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 50e12  # conservative default (also used on CPU smoke)


if __name__ == "__main__":
    main()
