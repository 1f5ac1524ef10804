"""Canonical crystal-graph batch schema (static shapes, padded).

The reference splits edge geometry across inconsistent fields
(``edge_attr`` vs ``cart_dir``/``cart_dist`` — see SURVEY.md §2.1 note on
/root/reference/dataset/extract_csd_data.py:139 vs datasetADP.py:70-71).
Here there is ONE canonical schema, shaped for XLA: every array is padded to a
static size and carries an explicit mask. Edges are stored sorted by
destination node so segment reductions can use the sorted fast path.

Conventions (matching the reference's PyG flow):
  * ``edge_index = (src, dst)`` where messages flow src -> dst and aggregation
    scatters onto dst (reference edge_index=(index2, index1),
    /root/reference/dataset/utils.py:235 + PyG source_to_target flow).
  * ``cart_dir`` is the unit vector from dst atom to the (PBC-imaged) src atom
    position: normalize(pos[dst] - (pos[src] + offset)), matching
    /root/reference/dataset/utils.py:196 (direction = pos1 - pos2 with
    pos1=index1=dst side) combined with figshare_dataset.py:68.
  * pad nodes/edges/graphs have mask=False; pad indices point at slot 0.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class CrystalBatch:
    # nodes [N]
    z: jnp.ndarray            # [N] int32 atomic numbers (0 on pads)
    pos: jnp.ndarray          # [N, 3] f32 cartesian coords
    graph_id: jnp.ndarray     # [N] int32 graph slot of each node (0 on pads)
    node_mask: jnp.ndarray    # [N] bool
    non_h_mask: jnp.ndarray   # [N] bool (False on pads and H atoms)
    # edges [E] — sorted by dst
    edge_src: jnp.ndarray     # [E] int32
    edge_dst: jnp.ndarray     # [E] int32
    cart_dir: jnp.ndarray     # [E, 3] f32 unit direction
    cart_dist: jnp.ndarray    # [E] f32 distance
    edge_mask: jnp.ndarray    # [E] bool
    # graphs [G]
    cell: jnp.ndarray         # [G, 3, 3] f32 lattice rows
    temperature: jnp.ndarray  # [G] f32 (standardized; zeros when unused)
    graph_mask: jnp.ndarray   # [G] bool
    # targets: scalar [G] or per-node ADP [N, 3, 3]
    y: jnp.ndarray
    # permutation making edge_src sorted (edge_src[edge_src_perm] ascending);
    # lets the src-gather's VJP scatter-add run as a SORTED segment-sum
    # (23x faster than XLA's unsorted scatter on TPU — scripts/profile_ops.py).
    # None inside edge-partitioned shard_map shards (perm is per-full-batch).
    edge_src_perm: Optional[jnp.ndarray] = None  # [E] int32
    # halo edge partitioning (parallel/halo.py): nodes AND edges sharded over
    # the ep mesh axis; per member, the local node rows to send to every other
    # ep member each layer. None on replicated/single-device batches.
    # Shapes per dp slice: [ep, ep, H] (member-major on the leading axis);
    # edge_src then indexes the member-local table
    # [x_local (n_per) ‖ recv (ep*H)] built by one all_to_all per layer.
    halo_send_idx: Optional[jnp.ndarray] = None   # [M, ep, H] int32
    halo_send_mask: Optional[jnp.ndarray] = None  # [M, ep, H] bool
    # fused edge-phase Pallas kernel (ops/pallas/edge_kernels.py): per-window
    # band base rows for the dst/src one-hot gathers. ALWAYS present (zeros
    # when unused) so batches with/without a valid plan share one pytree
    # structure; the static edge_fuse_ok flag gates the kernel.
    edge_dst_lo: Optional[jnp.ndarray] = None     # [E/T] int32
    edge_src_lo: Optional[jnp.ndarray] = None     # [E/T] int32
    edge_fuse_ok: bool = flax.struct.field(pytree_node=False, default=False)
    # static: src one-hot band width (128/256/384) the fused edge plan was
    # built for — the kernel's dominant FLOP term scales with it, so collate
    # picks the smallest band covering this batch's window spans
    # (ops/pallas/edge_kernels.plan_edge_windows)
    src_band: int = flax.struct.field(pytree_node=False, default=384)
    # static: True when the halo exchange carries ZERO rows (graph-snapped
    # cuts) — the layers then skip the gather+all_to_all entirely and use a
    # zeros recv block (parallel/halo.py plans this at re-layout time)
    halo_empty: bool = flax.struct.field(pytree_node=False, default=False)
    # per-window count of 128-row src blocks actually spanned
    # (1..src_band/128); the fused BACKWARD kernel always skips the unused
    # dxj block matmuls per window (pl.when), the forward optionally
    # (CARTNET_SRC_SKIP). Zeros when edge_fuse_ok is False.
    edge_src_nblk: Optional[jnp.ndarray] = None   # [E/T] int32
    # host-precomputed edge_src[edge_src_perm] (ascending): the gather VJP
    # needs the sorted ids, and an s32 gather ON DEVICE runs at ~2 GiB/s
    edge_src_sorted: Optional[jnp.ndarray] = None  # [E] int32
    # host-precomputed companions of the src sort (equi-block scatter-free
    # means, models/equivariant.py): edge_mask in src-sorted order and the
    # per-node REAL src degree. Recomputing them on device showed up as
    # ~350 us/step of serialized VMEM-bound fusions in the eComformer xprof
    # (round 5). Present exactly when edge_src_perm is.
    edge_mask_src_sorted: Optional[jnp.ndarray] = None  # [E] bool
    src_degree: Optional[jnp.ndarray] = None            # [N] f32
    # static: True when every edge window satisfies the Pallas segment-sum
    # span condition (batching._windows_ok) for both dst and sorted-src ids.
    pallas_seg_ok: bool = flax.struct.field(pytree_node=False, default=False)
    # static: halo overlap/fused coexistence (parallel/halo.py): the first
    # ``halo_interior_nt`` windows of EVERY member's edge block touch only
    # member-local src rows, so the fused edge kernel runs them against a
    # zeros-recv table while the boundary all_to_all is in flight; the
    # remaining windows run in a second kernel call after the exchange.
    # 0 = no split (single kernel call over the full table).
    halo_interior_nt: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def num_nodes(self) -> int:
        return self.z.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_src.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.temperature.shape[0]

    @property
    def adp_targets(self) -> bool:
        return self.y.ndim == 3
