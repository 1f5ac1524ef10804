"""xprof capture of any bench model's fused train chunk.

Usage: python scripts/xprof_model.py --model icomformer --outdir /tmp/xp_ico
Parse with the snippet in .claude/skills/verify/SKILL.md (hlo_stats gviz).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="cartnet")
    ap.add_argument("--outdir", default="/tmp/xp_model")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--graphs", type=int, default=4)
    ap.add_argument("--mean-atoms", type=int, default=194)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.data.batching import bandwidth_reorder, collate
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.factory import create_model
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        make_fused_chunk, stack_batches)

    dim, layers, graphs = 256, 4, args.graphs
    recs = [bandwidth_reorder(r) for r in
            synthetic_dataset(2 * graphs, mean_atoms=args.mean_atoms,
                              radius=5.0, adp=True, seed=0)]
    groups = [recs[i * graphs:(i + 1) * graphs] for i in range(2)]
    align = 512 if args.mean_atoms > 50 else 0
    rnd = lambda v, m: -(-v // m) * m
    cfg = Config(
        model=ModelConfig(name=args.model, dim_in=dim, dim_rbf=64,
                          num_layers=layers, cholesky=True,
                          compute_dtype=jnp.bfloat16),
        data=DataConfig(
            max_nodes=rnd(max(sum(len(r["z"]) for r in g) for g in groups), 128),
            max_edges=rnd(max(sum(rnd(len(r["edge_src"]), max(align, 1)) for r in g)
                              for g in groups), 512),
            max_graphs=graphs),
        optim=OptimConfig(lr=1e-3, batch_accumulation=16))
    model_init, model_apply = create_model(cfg.model)
    batches = [collate(recs[i * graphs:(i + 1) * graphs], cfg.data.max_nodes,
                       cfg.data.max_edges, graphs, edge_align=align)
               for i in range(2)]
    batches = [jax.tree.map(jnp.asarray, b) for b in batches]
    stacked = stack_batches([batches[i % 2] for i in range(args.iters)])
    opt = build_optimizer(cfg, 100)
    state = init_train_state(jax.random.key(0), cfg, model_init, opt)
    fused = make_fused_chunk(cfg, model_apply, opt, args.iters)
    state, _ = fused(state, stacked)
    np.asarray(state.step)
    with jax.profiler.trace(args.outdir):
        state, _ = fused(state, stacked)
        np.asarray(state.step)
    print("trace captured to", args.outdir, "iters:", args.iters)


if __name__ == "__main__":
    main()
