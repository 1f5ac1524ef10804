"""Multi-host runtime initialization.

The reference is strictly single-GPU (SURVEY.md §2.2); multi-host support is
new design. CLI flags --coordinator/--num_processes/--process_id feed this
before any mesh is built (cli.main), so ``jax.devices()`` spans the pod slice
and the (dp, ep) mesh in parallel/mesh.py lays collectives over ICI within a
slice and DCN across slices.
"""

from __future__ import annotations

import logging
from typing import Optional


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Single-controller ``jax.distributed.initialize`` per host.

    No-op when no coordinator is configured (single host).
    """
    if coordinator is None:
        return
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    logging.info("jax.distributed initialized: %d processes, %d devices",
                 jax.process_count(), len(jax.devices()))
