"""Device-mesh data parallelism: ray-axis sharding.

The reference is a single-GPU trainer (SURVEY.md §2.4 — no distributed training
anywhere); the TPU framework adds data parallelism over the ICI mesh as its native
scaling axis: the ray batch ([batch_imgs, rays_per_img]) is sharded along the ray
axis, parameters and the occupancy grid are replicated, and gradient reduction is an
XLA-inserted psum. Expressed with ``jax.sharding`` + jit — XLA places the collectives
on ICI automatically; no NCCL-style backend to port.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.multiview import PIXEL_MODES

DATA_AXIS = "data"

# Batch keys whose axis 1 is the ray axis (data/multiview.sample_batch): the
# per-image pixel modes plus the camera-space base rays. Dispatch is BY KEY —
# a replicated per-image array whose second dim coincidentally equals the ray
# count (e.g. [B, R_local, ...] pose/aux metadata) must NOT be assembled from
# process-local shards; the shape check below is validation only.
RAY_SHARDED_KEYS = frozenset(PIXEL_MODES) | {"base_rays_origins",
                                             "base_rays_dirs"}


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available — a silently "
                f"smaller mesh would train at reduced parallelism")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """[B, R, ...] arrays sharded along the ray axis (R divisible by mesh size)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ray_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch on the mesh: pixel modes sharded on the ray axis,
    per-image scalars (cam_idx) replicated.

    Every [B, R, ...] pixel-mode array must have its ray axis divisible by the
    mesh size; a mis-sized batch raises rather than silently replicating (which
    would lose all data parallelism with no visible signal)."""
    rs = ray_sharding(mesh)
    rep = replicated(mesh)
    arrs = {k: np.asarray(v) for k, v in batch.items()}
    # The ray count R comes from the ray-generation arrays every batch carries
    # (multiview.sample_batch); classify [B, R, ...] arrays by axis-1 == R so
    # per-image metadata of any rank (e.g. [B, 4, 4] view matrices) replicates
    # instead of being mistaken for a mis-sized ray axis.
    ray_len = next((arrs[k].shape[1] for k in
                    ("base_rays_origins", "rays_origins", "rgb", "imgs")
                    if k in arrs and arrs[k].ndim >= 2), None)
    if ray_len is None:
        raise ValueError("batch has no recognised ray-mode array to size the "
                         "ray axis from")
    if ray_len % mesh.size != 0:
        raise ValueError(
            f"ray axis {ray_len} is not divisible by the {mesh.size}-device "
            f"mesh — pick num_rays_sampled_per_img as a multiple of the mesh "
            f"size")
    out = {}
    for k, arr in arrs.items():
        if k in RAY_SHARDED_KEYS and arr.ndim >= 2:
            if arr.shape[1] != ray_len:
                raise ValueError(
                    f"ray-sharded batch key {k!r} has axis-1 size "
                    f"{arr.shape[1]}, expected the ray count {ray_len}")
            out[k] = jax.device_put(arr, rs)
        else:
            out[k] = jax.device_put(arr, rep)
    return out


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.device_put(tree, rep)


def shard_ray_batch_host_local(local_batch: Dict, mesh: Mesh) -> Dict:
    """Per-host input loading for real pods (SURVEY.md §2.4).

    On a multi-host mesh every process calls this with a batch whose pixel
    modes cover ONLY its ray-axis shard (R_local = R_global / num_processes);
    the global arrays are assembled shard-by-shard with
    ``jax.make_array_from_process_local_data`` — no host ever materialises or
    transfers the full batch (``shard_ray_batch`` device_puts the whole batch
    from one host, which is fine on a single-host mesh but serialises pod
    input on DCN). Per-image metadata (cam_idx, view matrices) must be
    IDENTICAL on every process and is replicated.

    Because ray batches are iid random pixel draws, hosts need no index
    coordination: each host samples its R_local rays with an independent rng
    stream and the union is exactly a global random batch. On a
    single-process mesh this degrades to ``shard_ray_batch`` semantics
    (R_local == R_global).
    """
    rs = ray_sharding(mesh)
    rep = replicated(mesh)
    n_proc = jax.process_count()
    arrs = {k: np.asarray(v) for k, v in local_batch.items()}
    ray_len_local = next((arrs[k].shape[1] for k in
                          ("base_rays_origins", "rays_origins", "rgb", "imgs")
                          if k in arrs and arrs[k].ndim >= 2), None)
    if ray_len_local is None:
        raise ValueError("batch has no recognised ray-mode array to size the "
                         "ray axis from")
    ray_len_global = ray_len_local * n_proc
    if ray_len_global % mesh.size != 0:
        raise ValueError(
            f"global ray axis {ray_len_global} ({ray_len_local} local x "
            f"{n_proc} processes) is not divisible by the {mesh.size}-device "
            f"mesh")
    out = {}
    for k, arr in arrs.items():
        if k in RAY_SHARDED_KEYS and arr.ndim >= 2:
            if arr.shape[1] != ray_len_local:
                raise ValueError(
                    f"ray-sharded batch key {k!r} has local axis-1 size "
                    f"{arr.shape[1]}, expected the local ray count "
                    f"{ray_len_local}")
            global_shape = arr.shape[:1] + (ray_len_global,) + arr.shape[2:]
            out[k] = jax.make_array_from_process_local_data(rs, arr,
                                                            global_shape)
        else:
            out[k] = jax.device_put(arr, rep)
    return out
