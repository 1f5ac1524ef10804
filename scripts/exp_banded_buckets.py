"""Measure per-bucket band recovery for big banded batches (VERDICT r4 #7).

At graphs=32 under ONE global shape, the banded kernels run ~15% below the
batch-4 rate (6.97M vs 8.15M, PERF_NOTES round-4) because the batch-wide
worst-case src band (384) and the padded edge count tax every window. The
size-bucketed pipeline (data/pipeline.py buckets>1) pads each size quantile
to its own shape, so small-crystal buckets should plan narrower bands and
higher fill. This experiment runs graphs=32 through the REAL BatchPipeline
at buckets=1 vs buckets=4 and reports per-bucket plans (band, fill) and
measured edges/s, all in one process (two-point timing per shape).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_banded_buckets.py
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
    from cartnet_tpu.data.pipeline import BatchPipeline
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.factory import create_model
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        make_fused_chunk, stack_batches)

    dim, layers, graphs = 256, 4, 32
    recs = synthetic_dataset(128, mean_atoms=194, radius=5.0, adp=True, seed=0)

    def run(buckets):
        pipe = BatchPipeline(recs, graphs, shuffle=False, cache=False,
                             buckets=buckets)
        groups = {}  # (mn, me) -> [batch]
        for b in pipe:
            key = (int(b.node_mask.shape[0]), int(b.edge_mask.shape[0]))
            groups.setdefault(key, []).append(b)
        print(f"--- buckets={buckets}: {len(groups)} shape group(s)")
        tot_edges = tot_time = 0.0
        for (mn, me), bs in sorted(groups.items()):
            real = float(np.mean([np.asarray(b.edge_mask).sum() for b in bs]))
            band = int(np.asarray(bs[0].src_band)) if bs[0].src_band else 0
            planned = bs[0].edge_dst_lo is not None
            cfg = Config(
                model=ModelConfig(name="cartnet", dim_in=dim, dim_rbf=64,
                                  num_layers=layers, cholesky=True,
                                  compute_dtype=jnp.bfloat16),
                data=DataConfig(max_nodes=mn, max_edges=me,
                                max_graphs=graphs),
                optim=OptimConfig(lr=1e-3, batch_accumulation=16))
            model_init, model_apply = create_model(cfg.model)
            opt = build_optimizer(cfg, 100)
            state = init_train_state(jax.random.key(0), cfg, model_init, opt)
            iters = 128
            dev = [jax.tree.map(jnp.asarray, b) for b in bs]
            stacked = stack_batches([dev[i % len(dev)] for i in range(iters)])
            hstacked = jax.tree.map(lambda a: a[:iters // 2], stacked)
            fused = make_fused_chunk(cfg, model_apply, opt, iters)
            half = make_fused_chunk(cfg, model_apply, opt, iters // 2)
            state, _ = fused(state, stacked)
            jax.block_until_ready(state.params)
            np.asarray(state.step)

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
            eps = real / t
            fill = real / me
            print(f"  shape ({mn:6},{me:7}) x{len(bs):2} batches: band={band}"
                  f" planned={planned} fill={fill:.2f} "
                  f"step={t * 1e3:.2f} ms {eps / 1e6:.2f}M edges/s")
            w = len(bs)
            tot_edges += real * w
            tot_time += t * w
        print(f"  AGGREGATE: {tot_edges / tot_time / 1e6:.2f}M edges/s")
        return tot_edges / tot_time

    r1 = run(1)
    r4 = run(4)
    print(f"bucketed/global ratio: {r4 / r1:.3f}")


if __name__ == "__main__":
    main()
