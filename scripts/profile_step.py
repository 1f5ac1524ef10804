"""Quick per-step timing breakdown on the real chip (one process at a time).

Usage: python scripts/profile_step.py [--bf16] [--fwd-only] [--trace DIR]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--edges", type=int, default=65536)
    ap.add_argument("--nodes", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.data.batching import collate
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        loss_fn, make_steps)

    cfg = Config(
        model=ModelConfig(dim_in=256, dim_rbf=64, num_layers=4, cholesky=True,
                          compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32),
        data=DataConfig(max_nodes=args.nodes, max_edges=args.edges, max_graphs=4),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1))

    recs = synthetic_dataset(4, mean_atoms=194, radius=5.0, adp=True, seed=0)
    batch = collate(recs, cfg.data.max_nodes, cfg.data.max_edges, 4)
    batch = jax.tree.map(jnp.asarray, batch)
    e_real = int(np.asarray(batch.edge_mask).sum())
    print(f"real edges {e_real}, padded {args.edges}; real nodes "
          f"{int(np.asarray(batch.node_mask).sum())}")

    opt = build_optimizer(cfg, 100)
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    micro, update, evals = make_steps(cfg, cartnet_apply, opt)

    def timed(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:<18} {dt * 1e3:8.3f} ms   {e_real / dt / 1e6:8.2f} M edges/s")
        return dt

    fwd = jax.jit(lambda p, s, b: cartnet_apply(p, s, b, cfg.model, False)[0])
    timed("forward(eval)", fwd, state.params, state.bn_state, batch)

    fwd_t = jax.jit(lambda p, s, b: cartnet_apply(p, s, b, cfg.model, True)[0])
    timed("forward(train)", fwd_t, state.params, state.bn_state, batch)

    grad = jax.jit(jax.grad(lambda p, s, b: loss_fn(p, s, b, cartnet_apply, cfg, True)[0]))
    timed("fwd+bwd", grad, state.params, state.bn_state, batch)

    def full(state):
        state, _ = micro(state, batch)
        return update(state)
    # note: micro donates state; re-init for timing loop correctness
    state2 = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    full_j = lambda: full(state2)  # state donated; just measure steady loop
    s = state2
    s, _ = micro(s, batch); s = update(s)
    jax.block_until_ready(s.params)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        s, _ = micro(s, batch)
        s = update(s)
    jax.block_until_ready(s.params)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{'micro+update':<18} {dt * 1e3:8.3f} ms   {e_real / dt / 1e6:8.2f} M edges/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                s, _ = micro(s, batch)
                s = update(s)
            jax.block_until_ready(s.params)
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
