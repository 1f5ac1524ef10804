"""Capture a jax.profiler trace of the bench train step and print an HLO-op
cost table (self-time) parsed from the xplane protobuf.

Usage: python scripts/xprof_step.py [--outdir /tmp/xp] [--top 40]

Methodology matches bench.py (fused lax.scan of 128 steps, tunnel-safe sync);
the table attributes on-chip time by HLO category/op so kernel-fusion work
targets the real cost centers (PERF_NOTES.md round-2/3 tables come from
here).
"""

from __future__ import annotations

import argparse
import glob
import os
from collections import defaultdict


def capture(outdir: str):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.data.batching import bandwidth_reorder, collate
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.factory import create_model
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        make_fused_steps, stack_batches)

    model_name = os.environ.get("CARTNET_BENCH_MODEL", "cartnet").lower()
    dim, layers, graphs = 256, 4, 4
    recs = synthetic_dataset(8, mean_atoms=194, radius=5.0, adp=True, seed=0)
    recs = [bandwidth_reorder(r) for r in recs]  # match bench.py
    groups = [recs[i * graphs:(i + 1) * graphs] for i in range(2)]
    align = 512
    rnd = lambda v, m: -(-v // m) * m
    need_n = max(sum(len(r["z"]) for r in g) for g in groups)
    need_e = max(sum(rnd(len(r["edge_src"]), align) for r in g)
                 for g in groups)
    cfg = Config(
        model=ModelConfig(name=model_name, dim_in=dim, dim_rbf=64,
                          num_layers=layers,
                          cholesky=True, compute_dtype=jnp.bfloat16),
        data=DataConfig(max_nodes=rnd(need_n, 128), max_edges=rnd(need_e, 512),
                        max_graphs=graphs),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1))
    batches = [collate(recs[i * graphs:(i + 1) * graphs], cfg.data.max_nodes,
                       cfg.data.max_edges, graphs, edge_align=align)
               for i in range(2)]
    batches = [jax.tree.map(jnp.asarray, b) for b in batches]
    iters = 128
    stacked = stack_batches([batches[i % 2] for i in range(iters)])
    model_init, model_apply = create_model(cfg.model)
    opt = build_optimizer(cfg, 100)
    state = init_train_state(jax.random.key(0), cfg, model_init, opt)
    fused = make_fused_steps(cfg, model_apply, opt, iters)
    state, _ = fused(state, stacked)
    np.asarray(state.step)  # tunnel-safe sync
    with jax.profiler.trace(outdir):
        state, _ = fused(state, stacked)
        np.asarray(state.step)
    print("trace captured to", outdir, flush=True)
    return iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/xprof_step")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    iters = 128
    if not args.parse_only:
        iters = capture(args.outdir)

    # ---- parse: hlo_stats via the xprof converter (same data as the
    # tensorboard "HLO Op Stats" table), printed as us/step
    paths = glob.glob(os.path.join(args.outdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {args.outdir}")
    path = max(paths, key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data([path], "hlo_stats", {})
    import gzip
    import io
    import json
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    # hlo_stats JSON: {..., "data": [[row], ...]} gviz-ish; handle both forms
    rows = obj if isinstance(obj, list) else obj.get("data", obj)
    print(json.dumps(rows[:2], indent=1)[:2000] if rows else "empty")
    out = os.path.join(args.outdir, "hlo_stats.json")
    with open(out, "w") as f:
        json.dump(obj, f)
    print("full table written to", out)


if __name__ == "__main__":
    main()
