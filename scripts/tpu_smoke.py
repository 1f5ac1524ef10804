"""Pre-commit TPU compile/execute smoke for the fused train step.

Why this exists: Pallas interpret-mode tests (CPU) cannot catch Mosaic
lowering constraints — round 3 shipped a HEAD whose fwd kernel used
(1, d) moment blocks over a (nt, d) array, legal in interpret mode and a
hard ValueError on the real chip (VERDICT r3 weak #1). This script compiles
AND executes the exact bench-shape fused step on the TPU, plus one compiled
shard_map step on a 1x1 (dp, ep) mesh so the vma-tagged kernel path (which
CPU meshes can only ever run as jnp twins) is exercised compiled at least
once per round (VERDICT r3 next #5).

Run BEFORE any end-of-round commit that touches kernel/model/step code:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_smoke.py

~1 min with a warm .jax_cache; budget 10-20 min after kernel changes
(remote-tunnel compile service). Exits non-zero on any failure.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# runnable from any cwd (sys.path[0] is scripts/)
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

    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{getattr(dev, 'device_kind', '?')}",
          flush=True)
    if dev.platform not in ("tpu",):
        print("FAIL: not running on a TPU — this smoke must exercise the "
              "Mosaic lowering path", flush=True)
        return 1

    # --- phase 1: bench-shape fused single-device step (compile + 4 steps)
    dim, layers, graphs = 256, 4, 4
    recs = [bandwidth_reorder(r) for r in
            synthetic_dataset(8, mean_atoms=194, radius=5.0, adp=True, seed=0)]
    import os
    align = int(os.environ.get("CARTNET_T_EDGES", "512"))
    rnd = lambda v, m: -(-v // m) * m
    groups = [recs[i * graphs:(i + 1) * graphs] for i in range(2)]
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
    if not (batches[0].edge_fuse_ok and batches[0].pallas_seg_ok):
        print("FAIL: bench batch lost its kernel plans — the smoke would not "
              "exercise the fused path", flush=True)
        return 1

    opt = build_optimizer(cfg, 100)
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    iters = 4
    stacked = stack_batches([batches[i % 2] for i in range(iters)])
    fused = make_fused_steps(cfg, cartnet_apply, opt, iters)
    t0 = time.perf_counter()
    state, stats = fused(state, stacked)
    loss = np.asarray(stats["loss"])  # device->host: forces real completion
    print(f"phase 1 fused step: compiled+ran {iters} steps in "
          f"{time.perf_counter() - t0:.1f}s, loss[0]={loss.ravel()[0]:.4f}",
          flush=True)
    if not np.all(np.isfinite(loss)):
        print("FAIL: non-finite loss in fused step", flush=True)
        return 1

    # --- phase 2: compiled shard_map step on a 1x1 mesh (real kernel path
    # with vma-tagged outputs — CPU meshes only ever run the jnp twins)
    from cartnet_tpu.parallel.mesh import make_mesh
    from cartnet_tpu.parallel.step import make_parallel_steps, stack_for_shards
    mesh = make_mesh(1, 1)
    sharded = stack_for_shards([batches[0]], ep=1)
    if not sharded.edge_fuse_ok:
        print("FAIL: sharded batch lost fuse plans", flush=True)
        return 1
    pmicro, _, _ = make_parallel_steps(cfg, cartnet_apply, opt, mesh)
    state2 = init_train_state(jax.random.key(1), cfg, cartnet_init, opt)
    t0 = time.perf_counter()
    state2, pstats = pmicro(state2, sharded)
    ploss = float(np.asarray(pstats["loss"]))
    print(f"phase 2 shard_map 1x1 step: {time.perf_counter() - t0:.1f}s, "
          f"loss={ploss:.4f}", flush=True)
    if not np.isfinite(ploss):
        print("FAIL: non-finite loss in sharded step", flush=True)
        return 1

    # --- phase 3: banded (HBM-streamed) kernel mode — big flat batch whose
    # tables exceed VMEM, exercising the DMA zero/RMW/band paths compiled
    recs3 = [bandwidth_reorder(r) for r in
             synthetic_dataset(16, mean_atoms=194, radius=5.0, adp=True,
                               seed=1)]
    n3 = rnd(sum(len(r["z"]) for r in recs3), 128)
    e3 = rnd(sum(rnd(len(r["edge_src"]), align) for r in recs3), 512)
    from cartnet_tpu.ops.pallas.edge_kernels import edge_tables_resident
    cfg3 = Config(
        model=ModelConfig(dim_in=dim, dim_rbf=64, num_layers=2,
                          cholesky=True, compute_dtype=jnp.bfloat16),
        data=DataConfig(max_nodes=n3, max_edges=e3, max_graphs=16),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1))
    b3 = collate(recs3, n3, e3, 16, edge_align=align)
    if edge_tables_resident(n3, n3, dim) or not b3.edge_fuse_ok:
        print("FAIL: phase-3 batch did not land in banded mode "
              f"(resident={edge_tables_resident(n3, n3, dim)}, "
              f"fuse={b3.edge_fuse_ok})", flush=True)
        return 1
    b3 = jax.tree.map(jnp.asarray, b3)
    st3 = init_train_state(jax.random.key(2), cfg3, cartnet_init, opt3 :=
                           build_optimizer(cfg3, 100))
    f3 = make_fused_steps(cfg3, cartnet_apply, opt3, 2)
    t0 = time.perf_counter()
    st3, stats3 = f3(st3, stack_batches([b3, b3]))
    l3 = np.asarray(stats3["loss"])
    print(f"phase 3 banded step: {time.perf_counter() - t0:.1f}s, "
          f"loss[0]={l3.ravel()[0]:.4f}", flush=True)
    if not np.all(np.isfinite(l3)):
        print("FAIL: non-finite loss in banded step", flush=True)
        return 1

    # --- phase 4: banded kernels under shard_map (vma-tagged + DMA paths
    # together) — a 1x1 mesh on the single chip compiles the real thing
    sharded3 = stack_for_shards([b3], ep=1)
    if not sharded3.edge_fuse_ok:
        print("FAIL: phase-4 sharded batch lost fuse plans", flush=True)
        return 1
    pmicro3, _, _ = make_parallel_steps(cfg3, cartnet_apply, opt3, mesh)
    st4 = init_train_state(jax.random.key(3), cfg3, cartnet_init, opt3)
    t0 = time.perf_counter()
    st4, pstats3 = pmicro3(st4, sharded3)
    l4 = float(np.asarray(pstats3["loss"]))
    print(f"phase 4 banded shard_map step: {time.perf_counter() - t0:.1f}s, "
          f"loss={l4:.4f}", flush=True)
    if not np.isfinite(l4):
        print("FAIL: non-finite loss in banded sharded step", flush=True)
        return 1

    print("TPU SMOKE OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
