"""Device mesh + data-parallel training over cameras.

TPU-native replacement for the reference's NCCL/DDP stack
(``gs_toolkit/scripts/train.py:60-118`` mp.spawn + process groups,
``pipelines/base_pipeline.py:202-207`` DistributedDataParallel):

  * ``jax.distributed.initialize()`` replaces the TCP rendezvous + NCCL init;
  * a 1-D ``Mesh`` over all devices (ICI within a slice, DCN across slices)
    replaces per-machine process groups;
  * ``shard_map`` with replicated Gaussian state and a camera batch sharded
    along the ``data`` axis replaces DDP; the gradient ``pmean`` inside the
    step is the explicit analog of DDP's bucket all-reduce, and XLA's
    latency-hiding scheduler overlaps it with the backward pass.

Densify statistics are also reduced across the axis (psum/pmax) so every
replica applies the identical refinement — the reference's per-rank
``after_train`` stats silently diverge under DDP.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (replaces dist.init_process_group,
    scripts/train.py:97-112). No-op on a single host with no coordinator."""
    if coordinator_address is None and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def get_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_parallel_train_step(train_step, mesh: Mesh):
    """Wrap an axis-aware train step (built with axis_name=DATA_AXIS) in
    shard_map: state replicated, (camera, gt, key) sharded on the leading
    axis. Each device consumes one camera per step.

    The wrapped signature is ``(state, cameras, gt_images, keys)`` where the
    camera pytree / gt batch / keys have leading dim == mesh size.
    """
    n = mesh.shape[DATA_AXIS]

    def sharded(
        state, cameras, gt_images, keys, masks=None, depths=None,
        camera_indices=None, mono_scales=None, mono_shifts=None,
    ):
        opt = (masks, depths, mono_scales, mono_shifts, camera_indices)
        extras_spec = tuple(P(DATA_AXIS) for x in opt if x is not None)
        extras = tuple(x for x in opt if x is not None)
        present = tuple(x is not None for x in opt)

        def inner(state, cam, gt, key, *ex):
            # shard_map keeps the (1,) shard leading dim; drop it.
            cam = jax.tree.map(lambda x: x[0], cam)
            vals = []
            i = 0
            for has in present:
                if has:
                    vals.append(ex[i][0])
                    i += 1
                else:
                    vals.append(None)
            mask, depth, mono_scale, mono_shift, cam_idx = vals
            new_state, metrics = train_step(
                state, cam, gt[0], key[0], mask, depth,
                mono_scale=mono_scale, mono_shift=mono_shift,
                camera_index=cam_idx,
            )
            return new_state, metrics

        return jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))
            + extras_spec,
            out_specs=(P(), P()),
            check_vma=False,
        )(state, cameras, gt_images, keys, *extras)

    return sharded


def local_mesh_size(mesh: Mesh) -> int:
    """Number of this process's devices in the mesh (batch entries this
    host contributes per step)."""
    pid = jax.process_index()
    return sum(1 for d in mesh.devices.flat if d.process_index == pid)


def host_local_to_global(mesh: Mesh, tree):
    """Assemble per-host batch shards into global jax.Arrays sharded on
    DATA_AXIS — the multi-controller analog of DDP's per-rank batches
    (reference scripts/train.py:60-118): each process supplies only its
    local cameras; jax stitches the global batch without any transfer.
    No-op (device_put-free) pass-through on a single process."""
    if jax.process_count() == 1:
        return tree
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P(DATA_AXIS))

    def conv(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(conv, tree)


def replicate_global(mesh: Mesh, tree):
    """Replicate a host-identical pytree as global arrays over the mesh
    (every process must hold the same values — true for deterministic
    seeded init and for jitted updates of already-replicated state)."""
    if jax.process_count() == 1:
        return tree
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P())

    def conv(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(conv, tree)
