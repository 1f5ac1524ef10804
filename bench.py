"""Benchmark: CartNet training-step throughput in edges/sec/chip.

ADP-scale workload (avg 194 atoms/crystal, radius 5.0 — reference README.md:95)
on the flagship config (dim 256, rbf 64, 4 layers, Cholesky head, batch 4 like
scripts/train_cartnet_adp.sh). Padding is right-sized to the workload (~4%
waste) — static shapes, one compilation.

The reference publishes no throughput numbers (SURVEY.md §6), so vs_baseline
compares against a speed-of-light roofline for the step's GEMM work:
per layer fwd, 2 edge-level [E,2d]-wide MLP GEMM pairs + node projections;
backward ~2x forward; at the chip's matmul peak.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    # persistent compile cache: Pallas+XLA compiles are minutes-slow through
    # the remote-compile tunnel; cache under the repo so reruns are instant.
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.data.batching import bandwidth_reorder, collate
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        make_steps)

    dim, layers, graphs = 256, 4, 4
    recs = synthetic_dataset(8, mean_atoms=194, radius=5.0, adp=True, seed=0)
    # RCM relabeling, exactly as the real pipeline applies it (narrower fused
    # edge-kernel src band — data/batching.bandwidth_reorder)
    recs = [bandwidth_reorder(r) for r in recs]
    # pad to the worst of the two actual batches (what the size-bucketed
    # pipeline achieves on real datasets: data/pipeline.py buckets>1), not
    # the whole-dataset worst case — same static shapes, ~96% fill vs ~76%
    groups = [recs[i * graphs:(i + 1) * graphs] for i in range(2)]
    import os
    align = int(os.environ.get("CARTNET_T_EDGES", "512"))  # window alignment
    rnd = lambda v, m: -(-v // m) * m
    need_n = max(sum(len(r["z"]) for r in g) for g in groups)
    need_e = max(sum(rnd(len(r["edge_src"]), align) for r in g)
                 for g in groups)
    max_nodes = rnd(need_n, 128)
    max_edges = rnd(need_e, 512)
    cfg = Config(
        model=ModelConfig(dim_in=dim, dim_rbf=64, num_layers=layers,
                          cholesky=True, compute_dtype=jnp.bfloat16),
        data=DataConfig(max_nodes=max_nodes, max_edges=max_edges,
                        max_graphs=graphs),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1))

    batches = [collate(recs[i * graphs:(i + 1) * graphs], max_nodes, max_edges,
                       graphs, edge_align=align) for i in range(2)]
    batches = [jax.tree.map(jnp.asarray, b) for b in batches]
    # the scan alternates both batches: throughput must use the MEAN real
    # edge count, not batch 0's (round-1 undercounted by ~8%)
    real_edges = float(np.mean([np.asarray(b.edge_mask).sum()
                                for b in batches]))
    real_nodes = float(np.mean([np.asarray(b.node_mask).sum()
                                for b in batches]))

    opt = build_optimizer(cfg, 100)
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)

    # K train steps fused into one lax.scan launch: measures pure chip time
    # (per-dispatch tunnel latency here is ~10x the actual step time)
    from cartnet_tpu.train.loop import make_fused_steps, stack_batches
    iters = 128  # amortize the ~25 ms tunnel dispatch to <0.2 ms/step
    stacked = stack_batches([batches[i % 2] for i in range(iters)])
    fused = make_fused_steps(cfg, cartnet_apply, opt, iters)

    state, _ = fused(state, stacked)  # compile + warmup
    jax.block_until_ready(state.params)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, _ = fused(state, stacked)
        jax.block_until_ready(state.params)
        best = min(best, time.perf_counter() - t0)

    edges_per_sec = real_edges * iters / best

    # roofline: per layer fwd = 2 edge GEMM pairs (d->d twice per MLP, merged
    # first layer counted as 2x [E,d]x[d,d]) + node projections; bwd ~ 2x fwd.
    flops_fwd = layers * (4 * max_edges + 4 * real_nodes) * dim * dim * 2
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
    table = {
        "tpu v5 lite": 197e12,  # v5e bf16 peak (XLA default matmul precision
        "tpu v5p": 459e12,      # runs f32 inputs through bf16 MXU passes)
        "tpu v4": 275e12,
        "tpu v6": 918e12,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 100e12  # conservative default (CPU smoke etc.)


if __name__ == "__main__":
    main()
