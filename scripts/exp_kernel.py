"""In-process A/B of trace-time kernel env flags on the bench workload.

Usage: python scripts/exp_kernel.py FLAG=VAL [FLAG=VAL ...]
Runs baseline (flags unset) then each FLAG=VAL variant, 3 timed rounds each,
all in one process (tunnel variance makes cross-process A/Bs unreliable).
Flags are read at trace time, so re-building the fused fn per variant works.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.data.batching import bandwidth_reorder, collate
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        make_fused_steps, stack_batches)

    dim, layers, graphs = 256, 4, 4
    recs = [bandwidth_reorder(r) for r in
            synthetic_dataset(8, mean_atoms=194, radius=5.0, adp=True, seed=0)]
    groups = [recs[i * graphs:(i + 1) * graphs] for i in range(2)]
    align = int(os.environ.get("CARTNET_T_EDGES", "512"))
    rnd = lambda v, m: -(-v // m) * m
    max_nodes = rnd(max(sum(len(r["z"]) for r in g) for g in groups), 128)
    max_edges = rnd(max(sum(rnd(len(r["edge_src"]), align) for r in g)
                        for g in groups), 512)
    cfg = Config(
        model=ModelConfig(dim_in=dim, dim_rbf=64, num_layers=layers,
                          cholesky=True, compute_dtype=jnp.bfloat16),
        data=DataConfig(max_nodes=max_nodes, max_edges=max_edges,
                        max_graphs=graphs),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1))
    batches = [collate(recs[i * graphs:(i + 1) * graphs], max_nodes,
                       max_edges, graphs, edge_align=align) for i in range(2)]
    batches = [jax.tree.map(jnp.asarray, b) for b in batches]
    real_edges = float(np.mean([np.asarray(b.edge_mask).sum()
                                for b in batches]))
    opt = build_optimizer(cfg, 100)
    iters = 128
    stacked = stack_batches([batches[i % 2] for i in range(iters)])

    def run(label):
        state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
        fused = make_fused_steps(cfg, cartnet_apply, opt, iters)
        state, _ = fused(state, stacked)
        jax.block_until_ready(state.params)
        np.asarray(state.step)
        eps = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, _ = fused(state, stacked)
            jax.block_until_ready(state.params)
            np.asarray(state.step)
            eps.append(real_edges * iters / (time.perf_counter() - t0))
        print(f"{label}: " + " ".join(f"{e/1e6:.2f}M" for e in eps)
              + f"  best {max(eps)/1e6:.2f}M", flush=True)

    run("baseline")
    for spec in sys.argv[1:]:
        k, _, v = spec.partition("=")
        old = os.environ.get(k)
        os.environ[k] = v
        run(spec)
        if old is None:
            del os.environ[k]
        else:
            os.environ[k] = old
    run("baseline again")


if __name__ == "__main__":
    main()
