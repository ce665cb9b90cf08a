"""Multi-host bootstrap — the process/device initialisation story.

The reference's only bootstrap is ``CUDA_VISIBLE_DEVICES`` from ``--cuda``
(``tools/options.py:295``) in a single process.  On TPU pods, multi-host
execution needs (a) ``jax.distributed.initialize`` so every host sees the
global device set, and (b) a mesh laid out so collectives ride ICI within a
slice and only cross DCN between slices.

Usage (each host runs the same program):

    from agplace_tpu.parallel.bootstrap import initialize_distributed
    initialize_distributed()          # no-op single-host; env-driven on pods
    ...build meshes / train as usual (device count is now global)...
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np

log = logging.getLogger("bootstrap")

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise the JAX distributed runtime when running multi-process.

    Resolution order: explicit args, then the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    or their ``COORDINATOR_ADDRESS``-style spellings).  On TPU pods with no
    env set, ``jax.distributed.initialize()`` auto-detects from the TPU
    metadata; on CPU/single-host with nothing configured this is a no-op.

    Returns True if the distributed runtime was (already) initialised.
    Idempotent.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS", os.environ.get("COORDINATOR_ADDRESS"))
    env_np = os.environ.get("JAX_NUM_PROCESSES",
                            os.environ.get("NUM_PROCESSES"))
    env_pid = os.environ.get("JAX_PROCESS_ID", os.environ.get("PROCESS_ID"))
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    on_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES") is not None
    if coordinator_address is None and not on_tpu_pod:
        log.debug("single-process run (no coordinator configured)")
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _INITIALIZED = True
        log.info("distributed runtime up: process %d/%d, %d global devices",
                 jax.process_index(), jax.process_count(),
                 jax.device_count())
        return True
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            # a launcher beat us to it: the runtime IS up — honour the
            # documented idempotency (return True, remember it) instead
            # of re-attempting and re-warning on every call
            _INITIALIZED = True
            log.info("jax.distributed already initialized by the launcher")
            return True
        log.warning("jax.distributed.initialize failed/skipped: %s", e)
        return False
    except Exception as e:
        log.warning("jax.distributed.initialize failed/skipped: %s", e)
        return False


def make_hybrid_mesh(
    data_axis: str = "data",
    gallery_axis: str = "gallery",
    gallery_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
):
    """Pod-aware mesh: the (data, gallery) axes are laid out with
    ``mesh_utils.create_hybrid_device_mesh`` when the run spans multiple
    processes — gradient all-reduce (data axis) crosses DCN between hosts
    while gallery all-gathers stay on ICI within a host's slice.  Falls back
    to a flat ICI mesh single-host (identical to ``parallel.mesh.make_mesh``).
    """
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    gp = max(gallery_parallel, 1)
    dp = n // gp
    assert dp * gp == n, f"mesh {dp}x{gp} != {n} devices"
    if jax.process_count() > 1:
        # split the data axis host-major: its DCN factor is the process
        # count, the ICI factor the per-host remainder; gallery stays
        # entirely within a host's slice
        per_host = n // jax.process_count()
        dcn_dp = max(dp // max(per_host // gp, 1), 1)
        # multi-slice TPU pods group devices by slice_index; in a single
        # slice (or CPU multi-process, where every device reports slice 0)
        # the process is the DCN granule
        slice_ids = {getattr(d, "slice_index", None) for d in devices}
        multi_slice = None not in slice_ids and len(slice_ids) > 1
        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp // dcn_dp, gp),
            dcn_mesh_shape=(dcn_dp, 1),
            devices=devices,
            process_is_granule=not multi_slice,
        )
        return Mesh(dev_array, (data_axis, gallery_axis))
    dev_array = np.array(devices).reshape(dp, gp)
    return Mesh(dev_array, (data_axis, gallery_axis))
