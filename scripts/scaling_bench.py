"""Scaling-efficiency harness: edges/s across (dp, ep) mesh layouts.

Measures the sharded train step on every feasible (dp, ep) factorization of
the available devices, for both the replicated-node ep layout and the halo
layout, and reports scaling efficiency vs the single-device step plus the
per-layer comms-bytes model (parallel/halo.py). The ≥80% 1→N target
(BASELINE.md) is judged on real multi-chip hardware; on the 8-virtual-CPU
mesh this validates the harness and the comms accounting, not absolute perf.

Run (CPU mesh):  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                 PYTHONPATH=/root/repo:/root/.axon_site python scripts/scaling_bench.py
Run (real pod):  PYTHONPATH=... python scripts/scaling_bench.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    import jax
    np.asarray(jax.device_get(jax.tree.leaves(x)[0]))


def timed(fn, state, reps=3):
    """fn donates and returns the train state: thread it through each rep."""
    state = fn(state)
    _sync(state)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state = fn(state)
        _sync(state)
        best = min(best, time.perf_counter() - t0)
    return best, state


def predict_efficiency(edges_per_sec_1chip: float, real_edges: int,
                       n_nodes: int, dim: int, num_layers: int,
                       n_params: int, halo_bytes_per_layer: int,
                       boundary_frac: float, hidden_frac: float,
                       dp: int, ep: int, hosts: int = 1,
                       ici_gbs: float = 90.0, dcn_gbs: float = 12.5,
                       itemsize: int = 4, accum: int = 16) -> dict:
    """Analytic edges/s efficiency prediction for a (dp, ep) layout.

    Folds the MEASURED single-chip rate (bench.py two-point, real TPU) and
    the COUNTED per-layer comms bytes (parallel/halo.py, validated against
    the virtual-mesh runs by tests/test_halo.py) into a roofline-style
    estimate (BASELINE north-star ≥80% 1→N):

      * per-layer compute time  t_l = real_edges / eps_1 / num_layers
        (fwd+bwd inclusive — eps_1 is an end-to-end step rate);
      * halo ep: the all_to_all (halo_bytes/ICI) overlaps the interior
        window prefix (hidden_frac of t_l); exposed = max(0, comm - hidden).
        Backward runs the transpose exchange with the same overlap structure.
      * replicated ep: per-layer [N, d] psum, 2(ep-1)/ep·N·d·itemsize each
        way, NOT overlapped (the aggregate feeds BN immediately) — fwd and
        bwd each pay one.
      * dp: one gradient all-reduce per optimizer step, 2(dp-1)/dp·P·4
        bytes; rides ICI within a host, DCN across hosts (dp is the outer
        mesh axis; ep stays inside a host).

    ici_gbs/dcn_gbs are per-chip effective bandwidths in GB/s — defaults are
    deliberately conservative for a v5e 2D-torus slice and overridable via
    CARTNET_ICI_GBS / CARTNET_DCN_GBS; the prediction scales linearly, so
    recalibrating bandwidth rescales the comms terms only."""
    eps1 = edges_per_sec_1chip
    t_layer = real_edges / eps1 / num_layers          # s per layer per chip
    t_step = real_edges / eps1
    ici = ici_gbs * 1e9
    dcn = dcn_gbs * 1e9

    # edge-parallel comms inside a layer
    if ep == 1:
        t_ep = 0.0
    elif halo_bytes_per_layer >= 0 and hidden_frac is not None:
        t_comm = halo_bytes_per_layer / ici
        hidden = hidden_frac * t_layer
        t_ep = 2.0 * max(0.0, t_comm - hidden)        # fwd + bwd exchanges
    else:
        t_ep = 0.0
    # replicated-ep alternative is computed by the caller with its own bytes

    # dp gradient all-reduce once per step
    # one all-reduce per OPTIMIZER step == per `accum` micro-steps
    # (reference cadence: batch 4 x accum 16, train/train.py:186-189)
    grad_bytes = 2.0 * (dp - 1) / dp * n_params * 4 if dp > 1 else 0.0
    bw = dcn if hosts > 1 else ici
    t_dp = grad_bytes / bw / max(accum, 1)

    t_total = t_step + num_layers * t_ep + t_dp
    eff = t_step / t_total
    return {"predicted_efficiency": round(eff, 4),
            "predicted_edges_per_sec": round(eps1 * dp * ep * eff, 1),
            "t_step_ms": round(t_step * 1e3, 4),
            "t_ep_exposed_ms_per_layer": round(t_ep * 1e3, 5),
            "t_dp_ms": round(t_dp * 1e3, 5)}


def predict_replicated(edges_per_sec_1chip: float, real_edges: int,
                       n_nodes: int, dim: int, num_layers: int,
                       n_params: int, dp: int, ep: int, hosts: int = 1,
                       ici_gbs: float = 90.0, dcn_gbs: float = 12.5,
                       accum: int = 16) -> dict:
    """Replicated-node ep layout: per-layer un-overlapped [N,d] psum."""
    eps1 = edges_per_sec_1chip
    t_step = real_edges / eps1
    ici = ici_gbs * 1e9
    psum_bytes = 2.0 * (ep - 1) / ep * n_nodes * dim * 4 if ep > 1 else 0.0
    t_ep = 2.0 * psum_bytes / ici                     # fwd + bwd per layer
    grad_bytes = 2.0 * (dp - 1) / dp * n_params * 4 if dp > 1 else 0.0
    t_dp = grad_bytes / ((dcn_gbs if hosts > 1 else ici_gbs) * 1e9) \
        / max(accum, 1)
    t_total = t_step + num_layers * t_ep + t_dp
    eff = t_step / t_total
    return {"predicted_efficiency": round(eff, 4),
            "predicted_edges_per_sec": round(eps1 * dp * ep * eff, 1),
            "t_step_ms": round(t_step * 1e3, 4),
            "t_ep_exposed_ms_per_layer": round(t_ep * 1e3, 5),
            "t_dp_ms": round(t_dp * 1e3, 5)}


def main():
    import os
    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the container sitecustomize pins jax_platforms to the axon TPU
        # tunnel; the env var alone does NOT override it
        jax.config.update("jax_platforms", "cpu")
    if jax.devices()[0].platform == "cpu":
        print("# NOTE: virtual CPU mesh — harness/comms validation only")
    import jax.numpy as jnp
    from cartnet_tpu.config import (Config, DataConfig, ModelConfig,
                                    OptimConfig, ParallelConfig)
    from cartnet_tpu.data.batching import collate
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
    from cartnet_tpu.parallel.halo import comms_bytes_per_layer, to_halo
    from cartnet_tpu.parallel.mesh import make_mesh
    from cartnet_tpu.parallel.step import make_parallel_steps, stack_for_shards
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        make_steps)

    n_dev = len(jax.devices())
    dim, layers, graphs_per_slice = 64, 4, 4
    n_per_slice, e_per_slice = 640, 12288

    def slice_batch(seed):
        recs = synthetic_dataset(graphs_per_slice, mean_atoms=96, radius=5.0,
                                 adp=True, seed=seed)
        return collate(recs, n_per_slice, e_per_slice, graphs_per_slice)

    def cfg_for(dp, ep, halo):
        return Config(
            model=ModelConfig(dim_in=dim, dim_rbf=16, num_layers=layers,
                              cholesky=True),
            data=DataConfig(max_nodes=n_per_slice, max_edges=e_per_slice,
                            max_graphs=graphs_per_slice),
            optim=OptimConfig(lr=1e-3, batch_accumulation=1),
            parallel=ParallelConfig(dp=dp, ep=ep, halo=halo))

    results = []

    # single-device baseline (same per-slice workload)
    cfg1 = cfg_for(1, 1, False)
    b1 = slice_batch(0)
    real_edges = int(np.asarray(b1.edge_mask).sum())
    opt = build_optimizer(cfg1, 100)
    st = init_train_state(jax.random.key(0), cfg1, cartnet_init, opt)
    micro, update, _ = make_steps(cfg1, cartnet_apply, opt)
    bj = jax.tree.map(jnp.asarray, b1)

    def one_step(st):
        st, _ = micro(st, bj)
        return update(st)

    t1, st = timed(one_step, st)
    base_eps = real_edges / t1
    results.append({"layout": "1x1", "halo": False,
                    "edges_per_sec": round(base_eps, 1), "efficiency": 1.0,
                    "comms_bytes_per_layer": 0})
    print(json.dumps(results[-1]), flush=True)

    layouts = []
    for dp in range(1, n_dev + 1):
        if n_dev % dp == 0:
            ep = n_dev // dp
            layouts.append((dp, ep))
    for dp, ep in layouts:
        for halo in ([False] if ep == 1 else [False, True]):
            cfg = cfg_for(dp, ep, halo)
            mesh = make_mesh(dp, ep)
            slices = [slice_batch(i) for i in range(dp)]
            boundary_frac = 0.0
            hidden_frac = 1.0
            if halo:
                slices_t = [to_halo(s, ep) for s in slices]
                cb = comms_bytes_per_layer(slices_t[0], dim)
                comms = cb[0]
                # overlap model: the all_to_all is dispatched before the
                # interior (src-local) gathers (models/cartnet.py), so the
                # exchange hides whenever boundary work << interior work
                b0 = slices_t[0]
                n_per = b0.z.shape[0] // ep
                em = np.asarray(b0.edge_mask)
                boundary = np.asarray(b0.edge_src) >= n_per
                boundary_frac = float((boundary & em).sum() / max(em.sum(), 1))
                # comms-hidden fraction on the FUSED path: the interior-first
                # window split (halo_interior_nt) runs that prefix of each
                # member's windows against a zeros-recv table while the
                # all_to_all flies; only the remaining windows wait on it
                from cartnet_tpu.ops.pallas.edge_kernels import T_EDGES
                hint = min(s.halo_interior_nt for s in slices_t)
                nt_per = b0.edge_src.shape[0] // ep // T_EDGES
                if comms == 0:
                    hidden_frac = 1.0  # nothing to hide (graph-snapped cuts)
                elif b0.edge_fuse_ok:
                    hidden_frac = hint / max(nt_per, 1)
                else:
                    hidden_frac = 1.0 - boundary_frac  # unfused overlap path
            else:
                slices_t = slices
                comms = (int(2 * (ep - 1) / ep * n_per_slice * dim * 4)
                         if ep > 1 else 0)
            stacked = stack_for_shards(slices_t, ep=ep)
            opt = build_optimizer(cfg, 100)
            st = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
            pm, pu, _ = make_parallel_steps(cfg, cartnet_apply, opt, mesh,
                                            halo=halo)

            def pstep(st):
                st, _ = pm(st, stacked)
                return pu(st)

            t, st = timed(pstep, st)
            eps = real_edges * dp / t
            results.append({
                "layout": f"{dp}x{ep}", "halo": halo,
                "edges_per_sec": round(eps, 1),
                "efficiency": round(eps / (base_eps * dp * ep), 4),
                "comms_bytes_per_layer": comms,
                # fraction of real edges whose source arrives via the halo
                # exchange — the work that CANNOT overlap the all_to_all;
                # everything else (1 - x) runs while the collective flies
                "boundary_edge_fraction": round(boundary_frac, 4),
                # fraction of per-member edge windows the fused kernel runs
                # BEFORE consuming the exchange (interior-first split) — the
                # compute available to hide the collective behind
                "comms_hidden_fraction": round(hidden_frac, 4)})
            print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"scaling_sweep": results}))

    # ---- predicted multi-chip efficiency at the FLAGSHIP shape ----
    # Folds the measured single-chip bench rate (BENCH / bench.py two-point,
    # overridable via CARTNET_BENCH_EPS) and comms bytes COUNTED on real
    # ADP-scale halo batches into the analytic model above — the quantitative
    # story behind the ≥80% north star (VERDICT r4 weak #8).
    import os as _os
    from cartnet_tpu.ops.pallas.edge_kernels import T_EDGES
    eps1 = float(_os.environ.get("CARTNET_BENCH_EPS", "8.15e6"))
    fdim, flayers, fparams = 256, 4, 2_498_566
    frecs = synthetic_dataset(4, mean_atoms=194, radius=5.0, adp=True, seed=0)
    from cartnet_tpu.data.batching import bandwidth_reorder
    frecs = [bandwidth_reorder(r) for r in frecs]
    fb = collate(frecs, 1536, 24576, 4, edge_align=T_EDGES)
    f_edges = int(np.asarray(fb.edge_mask).sum())
    ici = float(_os.environ.get("CARTNET_ICI_GBS", "90"))
    dcn = float(_os.environ.get("CARTNET_DCN_GBS", "12.5"))
    pred = []
    for dp, ep, hosts in [(1, 4, 1), (1, 8, 1), (4, 1, 1), (8, 1, 1),
                          (2, 4, 1), (4, 2, 1), (8, 2, 2), (16, 1, 2)]:
        row = {"layout": f"{dp}x{ep}", "hosts": hosts}
        if ep > 1:
            hb = to_halo(fb, ep)
            halo_bytes, psum_bytes = comms_bytes_per_layer(hb, fdim)
            em = np.asarray(hb.edge_mask)
            n_per = hb.z.shape[0] // ep
            bfrac = float(((np.asarray(hb.edge_src) >= n_per) & em).sum()
                          / max(em.sum(), 1))
            hint = hb.halo_interior_nt
            nt_per = hb.edge_src.shape[0] // ep // T_EDGES
            hfrac = (hint / max(nt_per, 1)) if hb.edge_fuse_ok else 1 - bfrac
            row["halo"] = dict(
                comms_bytes_per_layer=halo_bytes,
                boundary_edge_fraction=round(bfrac, 4),
                comms_hidden_fraction=round(hfrac, 4),
                **predict_efficiency(eps1, f_edges, fb.z.shape[0], fdim,
                                     flayers, fparams, halo_bytes, bfrac,
                                     hfrac, dp, ep, hosts, ici, dcn))
            row["replicated"] = predict_replicated(
                eps1, f_edges, fb.z.shape[0], fdim, flayers, fparams, dp, ep,
                hosts, ici, dcn)
        else:
            row["replicated"] = predict_replicated(
                eps1, f_edges, fb.z.shape[0], fdim, flayers, fparams, dp, ep,
                hosts, ici, dcn)
        pred.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"predicted_scaling": pred,
                      "assumptions": {"eps_1chip": eps1, "ici_gbs": ici,
                                      "dcn_gbs": dcn,
                                      "real_edges_per_batch": f_edges}}))


if __name__ == "__main__":
    main()
