"""Device-mesh and sharding helpers (pjit/NamedSharding based scale-out).

The reference is strictly single-device (SURVEY.md §2.3: no DP/TP/PP/SP anywhere);
on TPU the natural scale-out axis for inference is batch data-parallelism over the
ICI mesh, with optional tensor-parallel weight sharding for latency on the giant
model. XLA inserts the collectives from sharding annotations — no hand-written
NCCL/MPI analogs.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host (DCN) initialization wrapper. On single-host TPU or CPU this
    is a no-op; on a multi-host pod slice call it before any jax API (wraps
    jax.distributed.initialize, which reads the TPU env when args are None).
    Shardings/meshes then span all hosts' devices transparently."""
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh. Default: 1-D 'data' mesh over all local devices."""
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    need = int(np.prod(shape))
    if need > len(devices):
        raise ValueError(f"mesh {axes} needs {need} devices, have {len(devices)}")
    if need < len(devices):
        # a prefix subset is intentional for debug meshes, but a mistyped
        # --mesh would otherwise silently idle most of the hardware
        from dinov2_tpu.utils.logging import get_logger

        get_logger().warning(
            "mesh %s uses %d of %d available devices", axes, need, len(devices)
        )
    dev_array = np.array(devices[:need]).reshape(shape)
    return Mesh(dev_array, names)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(x: jnp.ndarray, mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """Shard the leading (batch) axis across the mesh; on a mesh without the
    batch axis (e.g. a pure 'model' TP mesh) the batch is replicated."""
    if axis not in mesh.axis_names:
        return jax.device_put(x, NamedSharding(mesh, P()))
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_map_data_parallel(fn, mesh: Mesh, axis: str = "data"):
    """Wrap `fn(params, x) -> pytree` in `jax.shard_map` over the batch axis:
    params replicated, x (and every output leaf) sharded on its leading dim.

    This is the composition route for the fused quantized matmul under a mesh:
    `pallas_call` has no GSPMD partitioning rule, so instead of relying on XLA
    to propagate shardings through the kernel, shard_map runs the whole forward
    per-device on the local batch shard (pure data parallelism — no collectives
    inside). check_vma=False because pallas_call's out_shape carries no varying
    -mesh-axes annotation. Verified bit-identical to the unsharded forward on a
    real v5e 1-device mesh and the virtual 8-device CPU mesh."""
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )


# ---------------------------------------------------------------------------
# Tensor-parallel param shardings (Megatron-style column/row split per block)
# ---------------------------------------------------------------------------


def param_pspecs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpecs for the DINOv2 param pytree: qkv/fc1/win are column-split
    (out features on `model_axis`), proj/fc2/wout are row-split (in features),
    so each attention/MLP block needs exactly one psum on its output.

    Kernels are stored (in, out) — see models/params.py — and layer-stacked with a
    leading layer axis, hence the leading None in layer specs.
    """

    col = P(None, None, model_axis)  # (L, in, out): split out
    row = P(None, model_axis, None)  # (L, in, out): split in
    col_bias = P(None, model_axis)  # (L, out)

    def spec_for(path: tuple, leaf) -> P:
        keys = [getattr(p, "key", None) for p in path]
        if "layers" in keys:
            if "qkv" in keys or "fc1" in keys or "win" in keys:
                if keys[-1] == "kernel":
                    return col
                if keys[-1] == "bias":
                    return col_bias
            if "proj" in keys or "fc2" in keys or "wout" in keys:
                if keys[-1] == "kernel":
                    return row
                return P()  # bias added after the psum, replicated
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh, tensor_parallel: bool = False) -> Any:
    """Place params on the mesh: replicated, or TP-sharded when requested."""
    if not tensor_parallel or "model" not in mesh.axis_names:
        return replicate(params, mesh)
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
