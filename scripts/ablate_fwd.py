"""Component-level attribution of the CartNet train step on the real TPU.

breakdown.py showed (bench shapes, bf16): fwd 2.0 ms vs pure-GEMM fwd ~0.27 ms
-> ~0.43 ms/layer of non-GEMM time. This script pins down WHERE by (a) timing
each component at exact step shapes, and (b) re-timing the fwd with single
components ablated (BN->identity, gathers->slices, no segment-sum, ...).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_fwd.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(out):
    import jax
    leaf = next(a for a in jax.tree.leaves(out) if hasattr(a, "dtype"))
    np.asarray(jax.device_get(leaf))


def timed(fn, *args, reps: int = 5):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools

    import jax.numpy as jnp
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.data.batching import collate
    from cartnet_tpu.data.pipeline import choose_pad_sizes
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models import cartnet as mc
    from cartnet_tpu.nn.norm import masked_batch_norm
    from cartnet_tpu.ops import rbf as rbf_ops, segment
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        loss_fn)

    dim, layers, graphs, iters = 256, 4, 4, 64
    recs = synthetic_dataset(2 * graphs, mean_atoms=194, radius=5.0, adp=True,
                             seed=0)
    N, E = choose_pad_sizes(recs, graphs)
    cfg = Config(
        model=ModelConfig(dim_in=dim, dim_rbf=64, num_layers=layers,
                          cholesky=True, compute_dtype=jnp.bfloat16),
        data=DataConfig(max_nodes=N, max_edges=E, max_graphs=graphs),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1))
    batch = jax.tree.map(jnp.asarray, collate(recs[:graphs], N, E, graphs))
    real_edges = int(np.asarray(batch.edge_mask).sum())
    opt = build_optimizer(cfg, 100)
    state = init_train_state(jax.random.key(0), cfg, mc.cartnet_init, opt)
    results = {"shapes": {"N": N, "E": E, "real_edges": real_edges}}

    def scan_time(fn, *args, n=iters):
        """Time fn under a length-n lax.scan (amortizes dispatch).

        fn(eps, *args) MUST mix the f32 scalar ``eps`` into its inputs —
        the carry threads through it so XLA cannot hoist the body out of
        the loop (loop-invariant code motion otherwise voids the timing).
        """
        @jax.jit
        def run(*a):
            def body(c, _):
                r = fn(c * 1e-30, *a)
                leaves = [x.astype(jnp.float32).sum()
                          for x in jax.tree.leaves(r)
                          if hasattr(x, "dtype") and jnp.issubdtype(
                              x.dtype, jnp.floating)]
                return c + sum(leaves), None
            tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                  length=n)
            return tot
        return 1e3 * timed(run, *args) / n

    # ---------------- fwd ablations -------------------------------------
    def fwd_variant(no_bn=False, slice_gather=False, no_segsum=False,
                    no_edge_gemm=False, no_env=False, xla_segsum=False):
        params, bn_state = state.params, state.bn_state

        def fwd(eps, params, bn_state, batch):
            mcfg = cfg.model
            p = jax.tree.map(lambda a: a.astype(mcfg.compute_dtype)
                             if a.dtype == mcfg.param_dtype else a, params)
            x, e = mc.encoder_apply(p["encoder"], batch, mcfg)
            x = x + eps.astype(x.dtype)  # carry dependency (defeats LICM)
            env = rbf_ops.cosine_cutoff(batch.cart_dist.astype(x.dtype),
                                        mcfg.radius)
            d = dim
            for i in range(layers):
                lp, ls = p[f"layer{i}"], bn_state[f"layer{i}"]
                wg, bg = lp["mlp_gate"]["lin0"]["w"], lp["mlp_gate"]["lin0"]["b"]
                wa, ba = lp["mlp_aggr"]["lin0"]["w"], lp["mlp_aggr"]["lin0"]["b"]
                wi = jnp.concatenate([wg[:d], wa[:d]], axis=1)
                wj = jnp.concatenate([wg[d:2 * d], wa[d:2 * d]], axis=1)
                we = jnp.concatenate([wg[2 * d:], wa[2 * d:]], axis=1)
                b = jnp.concatenate([bg, ba])
                xi = jnp.dot(x, wi, preferred_element_type=x.dtype)
                xj = jnp.dot(x, wj, preferred_element_type=x.dtype)
                if slice_gather:
                    reps = -(-E // N)
                    gi = jnp.concatenate([xi] * reps, 0)[:E]
                    gj = jnp.concatenate([xj] * reps, 0)[:E]
                else:
                    gi = segment.gather_edges(xi, batch.edge_dst,
                                              pallas_ok=batch.pallas_seg_ok,
                                              sorted_idx=True)
                    gj = segment.gather_edges(xj, batch.edge_src,
                                              batch.edge_src_perm,
                                              batch.pallas_seg_ok,
                                              idx_sorted=batch.edge_src_sorted)
                pre = gi + gj + b
                if not no_edge_gemm:
                    pre = pre + jnp.dot(e, we, preferred_element_type=x.dtype)
                h = jax.nn.silu(pre)
                gate = (h[:, :d] @ lp["mlp_gate"]["lin1"]["w"]
                        + lp["mlp_gate"]["lin1"]["b"])
                sender = (h[:, d:] @ lp["mlp_aggr"]["lin1"]["w"]
                          + lp["mlp_aggr"]["lin1"]["b"])
                if not no_bn:
                    gate, _ = masked_batch_norm(lp["bn"], ls["bn"], gate,
                                                batch.edge_mask, training=True,
                                                momentum=0.1, eps=1e-5)
                sigma = jax.nn.sigmoid(gate)
                if not no_env:
                    sigma = env[:, None] * sigma
                if no_segsum:
                    aggr = x
                else:
                    aggr = segment.masked_segment_sum(
                        sigma * sender, batch.edge_dst, batch.edge_mask, N,
                        sorted_ids=True,
                        pallas_ok=batch.pallas_seg_ok and not xla_segsum)
                if not no_bn:
                    aggr, _ = masked_batch_norm(lp["bn2"], ls["bn2"], aggr,
                                                batch.node_mask, training=True,
                                                momentum=0.1, eps=1e-5)
                x = jax.nn.silu(aggr) + x
                e = e + sigma
            pred = mc.cholesky_head_apply(p["head"], x)
            return pred

        return lambda eps: fwd(eps, params, bn_state, batch)

    variants = {
        "fwd_full": {},
        "fwd_no_bn": {"no_bn": True},
        "fwd_slice_gather": {"slice_gather": True},
        "fwd_no_segsum": {"no_segsum": True},
        "fwd_xla_segsum": {"xla_segsum": True},
        "fwd_no_edge_gemm": {"no_edge_gemm": True},
        "fwd_no_env": {"no_env": True},
    }
    for name, kw in variants.items():
        ms = scan_time(fwd_variant(**kw))
        results[name] = round(ms, 4)
        print(name, round(ms, 4), "ms", flush=True)

    # ---------------- component microbenches ----------------------------
    key = jax.random.key(0)
    x2d = jax.random.normal(key, (N, 2 * dim), jnp.bfloat16)
    e1 = jax.random.normal(key, (E, dim), jnp.bfloat16)
    eg = jax.random.normal(key, (E, dim), jnp.bfloat16)
    W = jax.random.normal(key, (dim, 2 * dim), jnp.bfloat16)
    dst = batch.edge_dst
    src = batch.edge_src
    perm = batch.edge_src_perm
    mask = batch.edge_mask

    def _p(eps, a):  # perturb input with the carry so LICM can't hoist
        return a + eps.astype(a.dtype)

    comp = {
        "gather_dst_[E,2d]": lambda eps: _p(eps, x2d).at[dst].get(
            mode="promise_in_bounds"),
        "gather_src_[E,2d]": lambda eps: _p(eps, x2d).at[src].get(
            mode="promise_in_bounds"),
        "gemm_e_[E,d]x[d,2d]": lambda eps: jnp.dot(
            _p(eps, e1), W, preferred_element_type=jnp.bfloat16),
        "bn_edges_[E,d]": lambda eps: masked_batch_norm(
            state.params["layer0"]["bn"], state.bn_state["layer0"]["bn"],
            _p(eps, eg.astype(jnp.float32)), mask, training=True, momentum=0.1,
            eps=1e-5)[0],
        "segsum_pallas_[E,d]": lambda eps: segment.masked_segment_sum(
            _p(eps, eg), dst, mask, N, sorted_ids=True, pallas_ok=True),
        "segsum_xla_[E,d]": lambda eps: segment.masked_segment_sum(
            _p(eps, eg), dst, mask, N, sorted_ids=True, pallas_ok=False),
        "scatter_vjp_sorted_[E,2d]": lambda eps: jax.ops.segment_sum(
            _p(eps, x2d).at[dst].get(mode="promise_in_bounds")[:E],
            dst, num_segments=N, indices_are_sorted=True),
        "sigmoid_mult_[E,d]": lambda eps: jax.nn.sigmoid(_p(eps, eg)) * e1,
    }
    for name, fn in comp.items():
        ms = scan_time(fn)
        results[name] = round(ms, 4)
        print(name, round(ms, 4), "ms", flush=True)

    # ---------------- optimizer-only ------------------------------------
    import optax
    grads = jax.tree.map(jnp.ones_like, state.params)

    @jax.jit
    def opt_scan(opt_state, params):
        def body(c, _):
            os_, p = c
            updates, os2 = opt.update(grads, os_, p)
            p2 = optax.apply_updates(p, updates)
            return (os2, p2), None
        (os2, p2), _ = jax.lax.scan(body, (opt_state, params), None,
                                    length=iters)
        return jax.tree.leaves(p2)[0].sum()

    ms = 1e3 * timed(opt_scan, state.opt_state, state.params) / iters
    results["optimizer_adam_onecycle"] = round(ms, 4)
    print("optimizer_adam_onecycle", round(ms, 4), "ms", flush=True)

    @jax.jit
    def sgd_scan(params):
        def body(p, _):
            p2 = jax.tree.map(lambda a, g: a - 1e-3 * g, p, grads)
            return p2, None
        p2, _ = jax.lax.scan(body, params, None, length=iters)
        return jax.tree.leaves(p2)[0].sum()

    ms = 1e3 * timed(sgd_scan, state.params) / iters
    results["optimizer_plain_sgd"] = round(ms, 4)
    print("optimizer_plain_sgd", round(ms, 4), "ms", flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
