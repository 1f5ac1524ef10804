"""Measure + profile the chunked big-batch path (VERDICT r3 next #4).

Builds ADP-scale batches at graphs=4 (reference config) and graphs=32
(the anti-scaling regime), runs the chunked vmap step under a lax.scan
(dispatch-amortized like bench.py), prints edges/s, and optionally captures
an xprof trace of the chunked scan for attribution.

Usage: python scripts/exp_chunked.py [--xprof /tmp/xp_chunk] [--k 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xprof", default=None)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import functools

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.lax as lax
    import jax.numpy as jnp
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.data.batching import bandwidth_reorder, collate
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
    from cartnet_tpu.parallel.chunk import make_chunked_steps, to_chunked
    from cartnet_tpu.train.loop import build_optimizer, init_train_state

    dim, layers = 256, 4
    align = 512
    rnd = lambda v, m: -(-v // m) * m

    def build(graphs, seed=0, k=1):
        recs = [bandwidth_reorder(r) for r in
                synthetic_dataset(graphs, mean_atoms=194, radius=5.0,
                                  adp=True, seed=seed)]
        # chunk packing needs ~half-a-crystal of pad slack per chunk
        # (PERF_NOTES r3) so graph-snapped cuts exist
        n = rnd(sum(len(r["z"]) for r in recs) + k * 256, 128 * max(k, 1))
        e = rnd(sum(rnd(len(r["edge_src"]), align) for r in recs)
                + k * 6144, 512 * max(k, 1))
        cfg = Config(
            model=ModelConfig(dim_in=dim, dim_rbf=64, num_layers=layers,
                              cholesky=True, compute_dtype=jnp.bfloat16),
            data=DataConfig(max_nodes=n, max_edges=e, max_graphs=graphs),
            optim=OptimConfig(lr=1e-3, batch_accumulation=16))
        batch = collate(recs, n, e, graphs, edge_align=align)
        return cfg, batch

    def run_chunked(graphs, k, label):
        cfg, batch = build(graphs, k=k)
        real_edges = float(np.asarray(batch.edge_mask).sum())
        cb = to_chunked(batch, k)
        n_per, e_per = cb.z.shape[1], cb.edge_src.shape[1]
        from cartnet_tpu.models.cartnet import kernels_active
        ka = kernels_active(cb, dim)
        print(f"{label}: n/chunk={n_per} e/chunk={e_per} "
              f"fill={real_edges / (k * e_per):.2f} kernels_active={ka}",
              flush=True)
        cb = jax.tree.map(jnp.asarray, cb)
        opt = build_optimizer(cfg, 100)
        state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
        micro, _, _ = make_chunked_steps(cfg, cartnet_apply, opt)

        # host-loop timing with the two-point method: per-call tunnel
        # dispatch (~25 ms) cancels in (time(2K) - time(K)) / K
        state, _ = micro(state, cb)
        jax.block_until_ready(state.params)
        np.asarray(state.step)

        def loop(m):
            t0 = time.perf_counter()
            nonlocal state
            for _ in range(m):
                state, _ = micro(state, cb)
            jax.block_until_ready(state.params)
            np.asarray(state.step)
            return time.perf_counter() - t0

        loop(2)
        best = float("inf")
        for _ in range(3):
            t1 = loop(args.iters)
            t2 = loop(2 * args.iters)
            best = min(best, (t2 - t1) / args.iters)
        eps = real_edges / best
        print(f"{label}: {eps / 1e6:.2f}M edges/s (per-step {best * 1e3:.2f} ms)",
              flush=True)
        if args.xprof:
            with jax.profiler.trace(args.xprof):
                loop(args.iters)
        return eps

    def run_flat(graphs, label, mean_atoms=194):
        import jax.numpy as jnp
        from cartnet_tpu.models.cartnet import kernels_active
        from cartnet_tpu.train.loop import make_fused_chunk, stack_batches
        recs = [bandwidth_reorder(r) for r in
                synthetic_dataset(graphs, mean_atoms=mean_atoms, radius=5.0,
                                  adp=True, seed=0)]
        al = align if mean_atoms > 50 else 0
        n = rnd(sum(len(r["z"]) for r in recs), 128)
        e = rnd(sum(rnd(max(len(r["edge_src"]), 1), max(al, 1)) for r in recs),
                512)
        cfg = Config(
            model=ModelConfig(dim_in=dim, dim_rbf=64, num_layers=layers,
                              cholesky=True, compute_dtype=jnp.bfloat16),
            data=DataConfig(max_nodes=n, max_edges=e, max_graphs=graphs),
            optim=OptimConfig(lr=1e-3, batch_accumulation=16))
        batch = collate(recs, n, e, graphs, edge_align=al)
        real_edges = float(np.asarray(batch.edge_mask).sum())
        from cartnet_tpu.ops.pallas.edge_kernels import edge_tables_resident
        print(f"{label}: N={n} E={e} fill={real_edges / e:.2f} "
              f"kernels_active={kernels_active(batch, dim)} "
              f"resident={edge_tables_resident(n, n, dim)}", flush=True)
        batch = jax.tree.map(jnp.asarray, batch)
        opt = build_optimizer(cfg, 100)
        state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
        iters = 32
        stacked = stack_batches([batch] * iters)
        fused = make_fused_chunk(cfg, cartnet_apply, opt, iters)
        half = make_fused_chunk(cfg, cartnet_apply, opt, iters // 2)
        hstacked = jax.tree.map(lambda a: a[:iters // 2], stacked)
        state, _ = fused(state, stacked)
        jax.block_until_ready(state.params)
        np.asarray(state.step)
        state, _ = half(state, hstacked)
        np.asarray(state.step)
        eps = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, _ = half(state, hstacked)
            jax.block_until_ready(state.params)
            np.asarray(state.step)
            t1 = time.perf_counter()
            state, _ = fused(state, stacked)
            jax.block_until_ready(state.params)
            np.asarray(state.step)
            t2 = time.perf_counter()
            # two-point: cancels the per-dispatch tunnel floor (bench.py)
            eps.append(real_edges * (iters - iters // 2)
                       / ((t2 - t1) - (t1 - t0)))
        print(f"{label}: " + " ".join(f"{x/1e6:.2f}M" for x in eps), flush=True)

    run_flat(32, "graphs=32 FLAT (banded kernels)")
    run_flat(64, "jarvis-style batch=64 FLAT", mean_atoms=12)
    run_chunked(32, args.k, f"graphs=32 chunks={args.k}")
    run_chunked(4, 1, "graphs=4 chunks=1 (sanity)")


if __name__ == "__main__":
    main()
