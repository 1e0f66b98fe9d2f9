"""Pipeline-parallel DINOv2 forward (GPipe-style microbatching over ICI).

The reference is single-device with a sequential layer loop
(/root/reference/dinov2.cpp:691-750, SURVEY.md §2.3: no PP anywhere). Every
DINOv2 fits one TPU chip, so PP is never REQUIRED — this exists to complete
the parallelism surface (dp/tp/sp land in parallel/mesh.py + train.py) and for
composition with device meshes whose HBM is claimed by other models.

TPU-native design (no NCCL/MPI analog, no per-stage processes):
  - the scan-stacked layer pytree (models/params.py) is sharded on its leading
    L axis over a 'stage' mesh axis — stage s holds layers [s*L/S, (s+1)*L/S);
  - the whole schedule is ONE jitted shard_map program: each stage runs its
    local `lax.scan` over its layer shard, then `lax.ppermute` passes the
    activation slab to the next stage while the previous microbatch's slab
    arrives from upstream (compute/ICI overlap is XLA's job);
  - GPipe fill/drain: M microbatches take M + S - 1 steps; utilization
    M / (M + S - 1).

Embedding / final-norm / head params are replicated and evaluated where
needed (embed on stage 0's injection path — computed redundantly everywhere,
it is <1% of FLOPs; final norm + taps after the collected output is
broadcast from the last stage).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dinov2_tpu.models.config import DinoConfig
from dinov2_tpu.models.vit import (
    ModelOptions,
    embed_tokens,
    encoder_layer,
    forward_head,
    layer_norm,
)

STAGE = "stage"


def layer_pspecs(params: Any, axis: str = STAGE) -> Any:
    """PartitionSpecs sharding the stacked layer pytree's leading L axis on
    `axis`; everything else replicated."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "layers" in keys:
            return P(axis, *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def place_pipeline_params(params: Any, mesh: Mesh) -> Any:
    """Shard layers across the 'stage' axis; replicate the rest."""
    specs = layer_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _stage_scan(layers: Any, tokens: jnp.ndarray, config, opts) -> jnp.ndarray:
    def body(carry, layer):
        return encoder_layer(carry, layer, config, opts), None

    out, _ = jax.lax.scan(body, tokens, layers)
    return out


@partial(
    jax.jit,
    static_argnames=("config", "opts", "mesh", "num_microbatches", "classify"),
)
def pipeline_forward(
    params: Any,
    x: jnp.ndarray,
    config: DinoConfig,
    opts: ModelOptions,
    mesh: Mesh,
    num_microbatches: int = 4,
    classify: bool = False,
) -> dict[str, jnp.ndarray]:
    """Pipeline-parallel equivalent of models/vit.py::forward.

    x: (B, H, W, 3) preprocessed images, B % num_microbatches == 0.
    Requires config.num_hidden_layers % mesh.shape['stage'] == 0.
    Numerically identical to the sequential forward (same layer math, same
    order — only the placement changes)."""
    n_stages = mesh.shape[STAGE]
    if config.num_hidden_layers % n_stages:
        raise ValueError(
            f"{config.num_hidden_layers} layers do not split over "
            f"{n_stages} stages"
        )
    m = num_microbatches
    if x.shape[0] % m:
        raise ValueError(f"batch {x.shape[0]} % microbatches {m} != 0")

    def staged(params, x):
        s = jax.lax.axis_size(STAGE)
        sid = jax.lax.axis_index(STAGE)
        tokens = embed_tokens(params, x, config, opts)  # (B, T, D), replicated
        b, t, d = tokens.shape
        mbs = tokens.reshape(m, b // m, t, d)

        buf = jnp.zeros_like(mbs)  # collected outputs (valid on last stage)
        recv = jnp.zeros_like(mbs[0])
        perm = [(i, (i + 1) % s) for i in range(s)]
        for step in range(m + s - 1):
            inject = mbs[min(step, m - 1)]
            act = jnp.where(sid == 0, inject, recv)
            out = _stage_scan(params["layers"], act, config, opts)
            if step >= s - 1:
                mb_idx = step - (s - 1)
                buf = buf.at[mb_idx].set(
                    jnp.where(sid == s - 1, out, buf[mb_idx])
                )
            if step < m + s - 2:  # no send needed after the last step
                recv = jax.lax.ppermute(out, STAGE, perm)
        # broadcast the last stage's collected outputs to every stage
        buf = jax.lax.psum(
            jnp.where(sid == s - 1, buf, jnp.zeros_like(buf)), STAGE
        )
        return buf.reshape(b, t, d)

    in_specs = (layer_pspecs(params), P())
    tokens = jax.shard_map(
        staged, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )(params, x)

    tokens = layer_norm(tokens.astype(jnp.float32), params["final_norm"], config.eps)
    out = {
        "cls_token": tokens[:, 0],
        "patch_tokens": tokens[:, 1 + config.num_register_tokens :],
    }
    if classify:
        out["probs"] = forward_head(params, tokens, config, opts)
    return out
