"""eComformer equi-block at big batch: fused TP kernels vs the XLA chain.

The TP kernels tie XLA at batch 4 (PERF_NOTES round 5) but keep VMEM/HBM
flat in E; the XLA chain materializes [E, 5120] weight tensors (1.7 GB
bf16 at graphs=32). This measures both paths at graphs={16,32} in one
process (flags are read at trace time).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_tp_bigbatch.py
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
    from cartnet_tpu.models.factory import create_model
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        make_fused_chunk, stack_batches)

    dim, layers = 256, 4
    for graphs in (16, 32):
        recs = [bandwidth_reorder(r) for r in
                synthetic_dataset(graphs, mean_atoms=194, radius=5.0,
                                  adp=True, seed=0)]
        align = 512
        rnd = lambda v, m: -(-v // m) * m
        mn = rnd(sum(len(r["z"]) for r in recs), 128)
        me = rnd(sum(rnd(len(r["edge_src"]), align) for r in recs), 512)
        cfg = Config(
            model=ModelConfig(name="ecomformer", dim_in=dim, dim_rbf=64,
                              num_layers=layers, cholesky=True,
                              compute_dtype=jnp.bfloat16),
            data=DataConfig(max_nodes=mn, max_edges=me, max_graphs=graphs),
            optim=OptimConfig(lr=1e-3, batch_accumulation=16))
        model_init, model_apply = create_model(cfg.model)
        batch = jax.tree.map(jnp.asarray,
                             collate(recs, mn, me, graphs, edge_align=align))
        real = float(np.asarray(batch.edge_mask).sum())
        for flag in ("1", "0"):
            os.environ["CARTNET_TP_FUSE"] = flag
            opt = build_optimizer(cfg, 100)
            state = init_train_state(jax.random.key(0), cfg, model_init, opt)
            iters = 64
            stacked = stack_batches([batch] * iters)
            hstacked = jax.tree.map(lambda a: a[:iters // 2], stacked)
            try:
                fused = make_fused_chunk(cfg, model_apply, opt, iters)
                half = make_fused_chunk(cfg, model_apply, opt, iters // 2)
                state, _ = fused(state, stacked)
                jax.block_until_ready(state.params)
                np.asarray(state.step)
            except Exception as ex:  # XLA path can OOM at these shapes
                print(f"graphs={graphs} TP_FUSE={flag}: FAILED "
                      f"{type(ex).__name__}: {str(ex)[:140]}")
                continue

            def timed(fn, st, data):
                t0 = time.perf_counter()
                st, _ = fn(st, data)
                jax.block_until_ready(st.params)
                np.asarray(st.step)
                return time.perf_counter() - t0, st

            ts = []
            for _ in range(3):
                th, state = timed(half, state, hstacked)
                tf, state = timed(fused, state, stacked)
                ts.append((tf - th) / (iters - iters // 2))
            t = float(np.median(ts))
            print(f"graphs={graphs} TP_FUSE={flag}: E={me} "
                  f"step={t * 1e3:.2f} ms {real / t / 1e6:.2f}M edges/s")
    os.environ.pop("CARTNET_TP_FUSE", None)


if __name__ == "__main__":
    main()
