"""CLI entry point: flags -> Config -> data/model/optimizer -> train/eval.

Mirrors the reference argparse surface (/root/reference/main.py:121-227) with
the same defaults, dispatching to train, inference, or montecarlo. Device
placement is the mesh's job (``--dp/--ep``), not a hard-coded "cuda:0".
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import List, Tuple

import numpy as np

from cartnet_tpu.config import (Config, DataConfig, ModelConfig, OptimConfig,
                                ParallelConfig)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("cartnet_tpu")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--name", type=str, default="CartNet")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--batch_accumulation", type=int, default=16)
    p.add_argument("--dataset", type=str, default="ADP",
                   help="ADP, jarvis, megnet, synthetic")
    p.add_argument("--dataset_path", type=str, default="./datasets")
    p.add_argument("--inference", action="store_true")
    p.add_argument("--montecarlo", action="store_true")
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--inference_output", type=str, default="./inference.pkl")
    p.add_argument("--figshare_target", type=str,
                   default="formation_energy_peratom")
    p.add_argument("--wandb_project", type=str, default="ADP")
    p.add_argument("--wandb_entity", type=str, default="")
    p.add_argument("--wandb", action="store_true", help="enable wandb logging")
    p.add_argument("--loss", type=str, default="MAE")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup", type=float, default=0.01)
    p.add_argument("--model", type=str, default="CartNet")
    p.add_argument("--max_neighbours", type=int, default=25)
    p.add_argument("--radius", type=float, default=5.0)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--dim_in", type=int, default=256)
    p.add_argument("--dim_rbf", type=int, default=64)
    p.add_argument("--augment", action="store_true")
    p.add_argument("--invariant", action="store_true")
    p.add_argument("--disable_temp", action="store_false", dest="use_temp")
    p.add_argument("--no_standarize_temp", action="store_false",
                   dest="standarize_temp")
    p.add_argument("--disable_envelope", action="store_false", dest="envelope")
    p.add_argument("--disable_H", action="store_false", dest="use_H")
    p.add_argument("--disable_atom_types", action="store_false",
                   dest="use_atom_types")
    p.add_argument("--dp", type=int, default=1, help="data-parallel mesh axis")
    p.add_argument("--ep", type=int, default=1, help="edge-parallel mesh axis")
    p.add_argument("--halo", action="store_true",
                   help="halo edge partitioning: shard nodes over ep too; "
                        "per-layer comms = boundary-atom all_to_all instead "
                        "of a full [N,d] all-reduce")
    p.add_argument("--halo_max", type=int, default=None,
                   help="static per-owner halo row cap (default: nodes/ep)")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--verify_ingest", action="store_true",
                   help="fetch + integrity-check the figshare payload, "
                        "report filter/split sizes and a sample graph "
                        "build, then exit")
    p.add_argument("--resume", action="store_true",
                   help="resume from the run's checkpoint dir")
    p.add_argument("--limit", type=int, default=None,
                   help="truncate dataset (smoke runs)")
    p.add_argument("--fused_steps", type=int, default=0,
                   help="fuse K micro-steps per device launch (lax.scan); "
                        "kills per-step dispatch latency on remote runtimes")
    p.add_argument("--buckets", type=int, default=1,
                   help="size-quantile buckets with per-bucket pad shapes; "
                        "bounds pad waste from size tails")
    p.add_argument("--chunks", type=int, default=1,
                   help="chunked single-device execution: vmap the kernels "
                        "over K member-major batch chunks (bounded VMEM for "
                        "large batches, e.g. jarvis batch 64)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the container sitecustomize "
                        "pins jax_platforms to the axon TPU tunnel)")
    p.add_argument("--cholesky", action="store_true",
                   help="force the Cholesky ADP head (e.g. synthetic ADP runs; "
                        "implied by --dataset ADP)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host: jax.distributed coordinator address "
                        "(host:port); omit on single host")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the first train "
                        "epoch to <run_dir>/profile (view with xprof/"
                        "tensorboard)")
    p.add_argument("--no_guard", action="store_false", dest="guard",
                   help="disable the device-side non-finite step guard and "
                        "divergence rollback (train/guard.py)")
    p.add_argument("--guard_retries", type=int, default=2,
                   help="checkpoint rollbacks allowed before aborting a "
                        "diverging run")
    p.add_argument("--heartbeat", type=str, default=None,
                   help="path of an atomic JSON liveness file updated every "
                        "epoch + every --heartbeat_interval seconds; "
                        "external watchdogs poll it (train/guard.py)")
    p.add_argument("--heartbeat_interval", type=float, default=30.0)
    return p


def args_to_config(args) -> Config:
    import jax.numpy as jnp
    model_name = args.model.lower()
    if model_name == "cartnet":
        model_name = "cartnet"
    dataset = args.dataset
    # reference semantics: main.py:176-187
    max_neigh = -1 if model_name == "cartnet" else args.max_neighbours
    augment = False if model_name in ("icomformer", "ecomformer") else args.augment
    # adpfix (the frozen learnable-ADP fixture, data/adpfix.py) runs the
    # full ADP product path: temperature input + Cholesky head + y-conjugated
    # SO(3) augmentation
    adp_like = dataset in ("ADP", "adpfix")
    use_temp = False if not adp_like else args.use_temp
    cholesky = adp_like or getattr(args, "cholesky", False)
    model = ModelConfig(
        name=model_name, dim_in=args.dim_in, dim_rbf=args.dim_rbf,
        num_layers=args.num_layers, radius=args.radius,
        invariant=args.invariant, use_temperature=use_temp,
        use_envelope=args.envelope, use_atom_types=args.use_atom_types,
        cholesky=cholesky,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    data = DataConfig(
        name=dataset, path=args.dataset_path, target=args.figshare_target,
        radius=args.radius, max_neighbors=max_neigh, batch_size=args.batch,
        augment=augment, use_hydrogens=args.use_H,
        standarize_temp=args.standarize_temp,
        optimize_cell=(model_name == "icomformer"),
        buckets=getattr(args, "buckets", 1),
        chunks=getattr(args, "chunks", 1))
    optim = OptimConfig(
        lr=args.lr, max_epoch=args.epochs, warmup=args.warmup,
        batch_accumulation=args.batch_accumulation, loss=args.loss,
        fused_steps=getattr(args, "fused_steps", 0))
    par = ParallelConfig(dp=args.dp, ep=args.ep,
                         halo=getattr(args, "halo", False),
                         halo_max=getattr(args, "halo_max", None))
    from cartnet_tpu.config import GuardConfig
    guard = GuardConfig(
        enabled=getattr(args, "guard", True),
        max_retries=getattr(args, "guard_retries", 2),
        heartbeat_path=getattr(args, "heartbeat", None),
        heartbeat_interval=getattr(args, "heartbeat_interval", 30.0))
    run_dir = os.path.join("results", args.name, str(args.seed))
    return Config(model=model, data=data, optim=optim, parallel=par,
                  guard=guard, seed=args.seed, name=args.name,
                  run_dir=run_dir)


def load_datasets(cfg: Config, limit=None) -> Tuple[List[dict], List[dict], List[dict]]:
    name = cfg.data.name
    if name == "synthetic":
        from cartnet_tpu.data.synthetic import synthetic_dataset
        n = limit or 128
        recs = synthetic_dataset(n + max(n // 4, 2) * 2, mean_atoms=32,
                                 radius=cfg.data.radius, adp=cfg.model.cholesky,
                                 seed=123)
        k = max(n // 4, 2)
        return recs[:n], recs[n:n + k], recs[n + k:n + 2 * k]
    if name == "adpfix":
        from cartnet_tpu.data.adpfix import load_fixture
        return load_fixture(standarize_temp=cfg.data.standarize_temp,
                            limit=limit)
    if name in ("jarvis", "megnet", "dft_3d_2021"):
        from cartnet_tpu.data.jarvis import build_dataset
        return build_dataset(name, cfg.data.target, cfg.data.path,
                             cfg.data.radius, cfg.data.max_neighbors,
                             limit=limit)
    if name == "ADP":
        from cartnet_tpu.data.adp import ADPDataset, LazyRecords
        csvdir = os.path.join(cfg.data.path, "csv")
        root = os.path.join(cfg.data.path, "data")
        sets = []
        for split in ("train", "val", "test"):
            # augment=False here: SO(3) augmentation is applied per-epoch by
            # BatchPipeline (runner._pipelines), not baked in at load time.
            # max_neighbors > 0 (Comformer runs) triggers the reference's
            # compute_knn re-edging (loader/loader.py:24-28); CartNet runs
            # pass -1 and keep the stored radius-graph edges.
            ds = ADPDataset(root, os.path.join(csvdir, f"{split}_files.csv"),
                            standarize_temp=cfg.data.standarize_temp,
                            hydrogens=cfg.data.use_hydrogens,
                            augment=False,
                            optimize_cell=cfg.data.optimize_cell,
                            max_neighbors=cfg.data.max_neighbors,
                            radius=cfg.data.radius)
            # lazy view: the 208k-record split streams per-refcode .pt like
            # the reference's DataLoader workers (loader/loader.py:115-123)
            # instead of materializing ~40 GB up front
            sets.append(LazyRecords(ds, limit=limit))
        return tuple(sets)
    raise ValueError(f"dataset '{name}' not implemented")


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    args = build_parser().parse_args(argv)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent compile cache: Pallas/XLA compiles are minutes-slow via
        # the remote tunnel. TPU-only — XLA:CPU AOT caching is machine-feature
        # sensitive and can SIGILL across container migrations.
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.coordinator:
        from cartnet_tpu.utils import initialize_distributed
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
    cfg = args_to_config(args)
    if args.verify_ingest:
        return verify_ingest(cfg)
    from cartnet_tpu.runner import run
    run(cfg, args)


def verify_ingest(cfg) -> None:
    """--verify_ingest: fetch/verify the raw payload, report filter + split
    sizes and a sample graph build, then exit (no training). Validates the
    800 MB figshare path (checksum/resume/CRC, jarvis.py) without
    committing to a full run."""
    import numpy as np
    name = cfg.data.name
    if name not in ("jarvis", "megnet", "dft_3d_2021"):
        raise ValueError(f"--verify_ingest supports figshare datasets only "
                         f"(got {name!r})")
    from cartnet_tpu.data import jarvis as J
    raw_name = "dft_3d_2021" if name == "jarvis" else name
    raw_dir = os.path.join(cfg.data.path, "raw")
    zip_path = os.path.join(raw_dir, f"{raw_name}.zip")
    if os.path.exists(zip_path):
        logging.info("archive integrity: %s",
                     J.verify_archive(raw_name, zip_path))
    data = J.load_raw(name, cfg.data.path)
    logging.info("raw records: %d", len(data))
    dat, targets = J.filter_by_target(data, cfg.data.target)
    tr, va, te = J.split_123(len(dat))
    logging.info("target %r: %d usable -> split %d/%d/%d (seed-123 "
                 "protocol, loader.py:130-141)", cfg.data.target, len(dat),
                 len(tr), len(va), len(te))
    k = min(3, len(dat))
    for i in range(k):
        rec = J.atoms_to_record(dat[i]["atoms"],
                                np.float32(targets[i]).item()
                                if np.ndim(targets[i]) == 0 else targets[i],
                                radius=cfg.data.radius)
        logging.info("sample %d: %d atoms, %d edges, finite=%s", i,
                     len(rec["z"]), len(rec["edge_src"]),
                     bool(np.isfinite(rec["cart_dist"]).all()))
    logging.info("verify_ingest OK")


if __name__ == "__main__":
    main()
