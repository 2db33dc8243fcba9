"""Multi-host initialization (DCN scale-out).

The single-controller programs in this framework scale across hosts the
standard JAX way: call :func:`init_multihost` once per process before any
device work, then build meshes with :func:`mioc_tpu.parallel.make_device_mesh`
— ``jax.devices()`` spans every host's chips, the ``batch`` axis shards
scenario work across hosts over DCN while ``level``-axis collectives stay on
ICI within a slice (SURVEY.md §5 distributed-communication notes).
"""

from __future__ import annotations

import jax

__all__ = ["init_multihost"]


def init_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed for a multi-host run.

    All arguments are auto-detected on Cloud TPU pods; pass them explicitly
    for manual clusters.  Safe to call when already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return jax.process_index(), jax.process_count()
