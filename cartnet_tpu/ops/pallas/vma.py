"""Varying-manual-axes (vma) plumbing for Pallas kernels under shard_map.

JAX ≥0.9 shard_map type-checks which mesh axes every value varies over
(``check_vma``). Standard primitives propagate this automatically, but a
``pallas_call``'s outputs must be tagged explicitly and a ``custom_vjp``
must hand back cotangents whose vma matches each primal input. These helpers
let one kernel source serve three callers — single device (vma = ∅), the
dp/ep replicated-node step, and the halo step:

  * ``vma_union(*arrays)``: the union of the inputs' varying axes;
  * ``pvary_to(x, vma)``: promote a replicated input so the kernel sees a
    uniform vma (a no-op outside shard_map);
  * ``psum_to(ct, like, vma)``: reduce a cotangent computed at the kernel's
    (union) vma down to the primal input's vma — the manual counterpart of
    the pvary transpose (per-member partial sums of a replicated parameter's
    gradient must be psum'd over the axes the parameter was broadcast to).
"""

from __future__ import annotations

import jax


def vma_union(*arrays) -> frozenset:
    out: frozenset = frozenset()
    for a in arrays:
        out = out | jax.typeof(a).vma
    return out


def pvary_to(x, vma: frozenset):
    extra = tuple(sorted(vma - jax.typeof(x).vma))
    return jax.lax.pvary(x, extra) if extra else x


def psum_to(ct, primal, kernel_vma: frozenset):
    """Reduce cotangent ``ct`` (varying over ``kernel_vma``) to the vma of
    ``primal`` — psum over the axes the primal was implicitly broadcast to."""
    extra = tuple(sorted(kernel_vma - jax.typeof(primal).vma))
    return jax.lax.psum(ct, extra) if extra else ct
