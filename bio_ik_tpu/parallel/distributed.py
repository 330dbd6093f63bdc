"""Multi-host bring-up helpers: jax.distributed + pod meshes.

TPU-native counterpart of the reference's "distributed backend" slot —
the reference has none beyond pthreads (SURVEY §5.8; reference:
src/ik_parallel.h:43-87 is a single-process barrier pool).  On TPU the
equivalents are the JAX runtime collectives: this module wraps
``jax.distributed.initialize`` for multi-host slices and builds the
meshes the island/scenario sharding layers consume
(:mod:`bio_ik_tpu.parallel.islands`).

Within a slice, collectives ride ICI; across hosts, DCN.  The island
solve only all-gathers a handful of floats per chunk (the winner
reduction / elite migration), so island sharding scales to pod slices
without attention to collective bandwidth; scenario batching needs no
collectives at all.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["initialize_distributed", "make_pod_mesh", "local_batch_slice"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime for a multi-host slice.

    On Cloud TPU pods all arguments auto-detect from the environment; pass
    them explicitly elsewhere.  Safe to call once per process before any
    device computation.  Single-process environments may skip this
    entirely.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh(axes: Sequence[str] = ("data",),
                  shape: Optional[Sequence[int]] = None) -> Mesh:
    """Global mesh over every device of every host.

    Default: a 1-D mesh (scenario batching or island racing).  With two
    axes (e.g. ``("data", "islands")``) and a ``shape``, scenario shards
    split across the first axis and each scenario's islands across the
    second.
    """
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices),) if len(axes) == 1 else None
    if shape is None:
        raise ValueError("shape is required for multi-axis meshes")
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    return Mesh(devices.reshape(tuple(shape)), tuple(axes))


def local_batch_slice(global_batch: int, axis_size: int,
                      process_index: Optional[int] = None) -> slice:
    """Rows of a globally-sharded scenario batch owned by this process.

    Multi-host programs construct global arrays with
    ``jax.make_array_from_process_local_data``; this gives the local row
    range for a batch evenly sharded over ``axis_size`` mesh slots.
    """
    if global_batch % axis_size:
        raise ValueError(f"batch {global_batch} not divisible by {axis_size}")
    pi = jax.process_index() if process_index is None else process_index
    per = global_batch // jax.process_count()
    return slice(pi * per, (pi + 1) * per)
