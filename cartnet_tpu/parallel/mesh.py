"""Device mesh + sharding layout for crystal-graph training.

Axes:
  * ``dp`` — data parallel: each dp slice owns a disjoint set of crystals
    (nodes/edges/graphs all split on their leading axis).
  * ``ep`` — edge parallel (the GNN analogue of TP/SP): within a dp slice the
    edge list is further split across ``ep`` devices while node arrays stay
    replicated; XLA partitions the per-edge MLPs accordingly and inserts an
    all-reduce of the [N, d] node aggregates (the reference has no distributed
    support at all — SURVEY.md §2.2 — so this layout is new design).

This module provides the mesh and NamedShardings; the train step is a plain
jit with ``in_shardings`` and XLA GSPMD handles collective insertion, per the
scaling-book recipe (mesh -> annotate -> let XLA insert collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cartnet_tpu.data.schema import CrystalBatch


def make_mesh(dp: int = 1, ep: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp * ep > len(devices):
        raise ValueError(f"mesh {dp}x{ep} needs {dp * ep} devices, "
                         f"have {len(devices)}")
    import numpy as np
    arr = np.array(devices[: dp * ep]).reshape(dp, ep)
    return Mesh(arr, ("dp", "ep"))


def batch_pspecs(halo: bool = False, node_targets: bool = False,
                 with_perm: bool = False) -> CrystalBatch:
    """PartitionSpec per CrystalBatch field (leading-axis layout).

    Replicated-node layout (halo=False): node/graph arrays split over dp only
    (replicated over ep); edge arrays split over (dp, ep) jointly — dp-major,
    ep-minor — so each device owns a contiguous dst-sorted slice of its
    dp-slice's edges.

    Halo layout (halo=True, parallel/halo.py): node arrays are ALSO split
    over ep (member-major blocks from to_halo), as are node-aligned targets;
    graph arrays stay replicated within the dp slice (graph slots are global
    there). halo_send_idx/mask are member-major on their leading axis.

    The Pallas window plans (``edge_dst_lo``/``edge_src_lo``, one entry per
    T_EDGES window) split like the edge axis, so every member receives the
    plan rows for exactly its windows. ``with_perm``: the slice-local
    src-sort permutation fields survive only when the edge axis is not split
    over ep (see parallel/step.py::stack_for_shards).
    """
    node = P(("dp", "ep")) if halo else P("dp")
    edge = P(("dp", "ep"))
    graph = P("dp")
    return CrystalBatch(
        z=node, pos=node, graph_id=node, node_mask=node, non_h_mask=node,
        edge_src=edge, edge_dst=edge, cart_dir=edge, cart_dist=edge,
        edge_mask=edge,
        cell=graph, temperature=graph, graph_mask=graph,
        y=node if node_targets else graph,
        edge_src_perm=edge if with_perm else None,
        edge_src_sorted=edge if with_perm else None,
        edge_mask_src_sorted=edge if with_perm else None,
        src_degree=node if with_perm else None,
        edge_dst_lo=edge, edge_src_lo=edge, edge_src_nblk=edge,
        halo_send_idx=P(("dp", "ep")) if halo else None,
        halo_send_mask=P(("dp", "ep")) if halo else None)


def batch_shardings(mesh: Mesh) -> CrystalBatch:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), batch_pspecs(),
                        is_leaf=lambda x: isinstance(x, P))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: CrystalBatch, mesh: Mesh) -> CrystalBatch:
    """Device-put a host batch with the canonical layout."""
    sh = batch_shardings(mesh)
    return jax.tree.map(jax.device_put, batch, sh)
