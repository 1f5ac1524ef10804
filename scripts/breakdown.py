"""Per-component timing breakdown of the CartNet train step on the real TPU.

Attribution for the bench number (BENCH_r*.json): times jitted variants of the
step with the fused-scan methodology from bench.py (K steps in one lax.scan
launch; a device->host scalar pull closes each timing — see
.claude/skills/verify/SKILL.md for why that is required through the tunnel).

Variants:
  full         — the bench step (fwd+bwd+adam) at bench shapes
  fwd          — forward+loss only
  grads        — forward+backward, no optimizer
  full_remat   — full step with per-layer rematerialization
  full_gN      — full step with N graphs per batch (utilization scaling)
  gemm_only    — the step's GEMM sequence alone (no gathers/scatter/BN):
                 upper bound for the current math at these shapes

Writes results as a JSON dict to stdout and PERF_NOTES.md-ready lines.
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_batches(graphs: int, seed: int = 0):
    import jax
    import jax.numpy as jnp
    from cartnet_tpu.data.batching import collate
    from cartnet_tpu.data.pipeline import choose_pad_sizes
    from cartnet_tpu.data.synthetic import synthetic_dataset

    recs = synthetic_dataset(2 * graphs, mean_atoms=194, radius=5.0, adp=True,
                             seed=seed)
    max_nodes, max_edges = choose_pad_sizes(recs, graphs)
    batches = [collate(recs[i * graphs:(i + 1) * graphs], max_nodes, max_edges,
                       graphs) for i in range(2)]
    batches = [jax.tree.map(jnp.asarray, b) for b in batches]
    return batches, max_nodes, max_edges


def _sync(out):
    import jax
    leaf = next(a for a in jax.tree.leaves(out)
                if hasattr(a, "dtype")
                and not jax.dtypes.issubdtype(a.dtype, jax.dtypes.extended))
    np.asarray(jax.device_get(leaf))  # force a real d2h sync (tunnel-safe)


def timed(fn, *args, reps: int = 3, carry: bool = False):
    """Compile+warm once, then best-of-reps wall time (tunnel-safe).

    carry=True: fn donates args[0] and returns (new_args0, aux); each rep
    feeds the previous output back in (bench.py methodology).
    """
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        if carry:
            args = (out[0],) + args[1:]
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools

    import jax.numpy as jnp
    import optax
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        loss_fn, make_fused_steps,
                                        stack_batches)

    dim, layers = 256, 4
    iters = 32
    results = {}

    def cfg_for(graphs, max_nodes, max_edges, remat=False):
        return Config(
            model=ModelConfig(dim_in=dim, dim_rbf=64, num_layers=layers,
                              cholesky=True, compute_dtype=jnp.bfloat16,
                              remat=remat),
            data=DataConfig(max_nodes=max_nodes, max_edges=max_edges,
                            max_graphs=graphs),
            optim=OptimConfig(lr=1e-3, batch_accumulation=1))

    def measure_full(graphs, remat=False, tag=None):
        batches, mn, me = make_batches(graphs)
        cfg = cfg_for(graphs, mn, me, remat)
        real_edges = int(np.asarray(batches[0].edge_mask).sum())
        opt = build_optimizer(cfg, 100)
        state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
        stacked = stack_batches([batches[i % 2] for i in range(iters)])
        fused = make_fused_steps(cfg, cartnet_apply, opt, iters)
        t, (state, _) = timed(lambda s: fused(s, stacked), state, carry=True)
        name = tag or f"full_g{graphs}" + ("_remat" if remat else "")
        results[name] = {"ms_per_step": 1e3 * t / iters,
                         "edges_per_sec": real_edges * iters / t,
                         "real_edges": real_edges,
                         "max_nodes": mn, "max_edges": me}
        print(name, results[name], flush=True)
        return batches, cfg, state, real_edges

    # --- baseline bench config -------------------------------------------
    batches, cfg, state, real_edges = measure_full(4, tag="full")

    # --- forward only ------------------------------------------------------
    stacked = stack_batches([batches[i % 2] for i in range(iters)])

    @functools.partial(jax.jit, donate_argnums=())
    def fwd_scan(params, bn_state, stacked):
        def one(carry, batch):
            loss, _ = loss_fn(params, bn_state, batch, cartnet_apply, cfg, True)
            return carry + loss, None
        tot, _ = jax.lax.scan(one, jnp.zeros((), jnp.float32), stacked,
                              length=iters)
        return tot

    t, _ = timed(fwd_scan, state.params, state.bn_state, stacked)
    results["fwd"] = {"ms_per_step": 1e3 * t / iters,
                      "edges_per_sec": real_edges * iters / t}
    print("fwd", results["fwd"], flush=True)

    # --- grads only (no optimizer) ----------------------------------------
    @jax.jit
    def grad_scan(params, bn_state, stacked):
        def one(carry, batch):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bn_state, batch, cartnet_apply, cfg, True)
            return jax.tree.map(jnp.add, carry, grads), loss
        zeros = jax.tree.map(jnp.zeros_like, params)
        acc, losses = jax.lax.scan(one, zeros, stacked, length=iters)
        return jax.tree.leaves(acc)[0].sum() + losses.sum()

    t, _ = timed(grad_scan, state.params, state.bn_state, stacked)
    results["grads"] = {"ms_per_step": 1e3 * t / iters,
                        "edges_per_sec": real_edges * iters / t}
    print("grads", results["grads"], flush=True)

    # --- remat -------------------------------------------------------------
    measure_full(4, remat=True, tag="full_remat")

    # --- utilization scaling with batch size -------------------------------
    for g in (16, 32):
        measure_full(g)
        measure_full(g, remat=True)

    # --- GEMM-only upper bound ---------------------------------------------
    _, _, me_ref = np.asarray(batches[0].edge_mask), None, None
    E = cfg.data.max_edges
    N = cfg.data.max_nodes
    key = jax.random.key(1)
    xw = jax.random.normal(key, (N, dim), jnp.bfloat16)
    ew = jax.random.normal(key, (E, dim), jnp.bfloat16)
    Wn = jax.random.normal(key, (dim, 2 * dim), jnp.bfloat16)
    We = jax.random.normal(key, (dim, 2 * dim), jnp.bfloat16)
    W1 = jax.random.normal(key, (dim, dim), jnp.bfloat16)

    def gemm_loss(params, x, e):
        Wn_, We_, W1_ = params
        for _ in range(layers):
            xi = jnp.dot(x, Wn_, preferred_element_type=jnp.bfloat16)
            xj = jnp.dot(x, Wn_, preferred_element_type=jnp.bfloat16)
            pre = jax.nn.silu(jnp.dot(e, We_,
                                      preferred_element_type=jnp.bfloat16)
                              + xi.mean(0) + xj.mean(0))
            gate = jnp.dot(pre[:, :dim], W1_,
                           preferred_element_type=jnp.bfloat16)
            send = jnp.dot(pre[:, dim:], W1_,
                           preferred_element_type=jnp.bfloat16)
            e = e + jax.nn.sigmoid(gate) * send
        return e.astype(jnp.float32).mean()

    @jax.jit
    def gemm_scan(params, x, e):
        def one(carry, _):
            g = jax.grad(gemm_loss)(params, x, e)
            return jax.tree.map(jnp.add, carry, g), None
        acc, _ = jax.lax.scan(one, jax.tree.map(jnp.zeros_like, params),
                              None, length=iters)
        return jax.tree.leaves(acc)[0].sum()

    t, _ = timed(gemm_scan, (Wn, We, W1), xw, ew)
    results["gemm_only"] = {"ms_per_step": 1e3 * t / iters,
                            "edges_per_sec": real_edges * iters / t}
    print("gemm_only", results["gemm_only"], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
