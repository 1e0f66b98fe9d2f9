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


def _pipeline_tokens(
    params: Any,
    x: jnp.ndarray,
    config: DinoConfig,
    opts: ModelOptions,
    mesh: Mesh,
    num_microbatches: int,
) -> jnp.ndarray:
    """The shard_map'd GPipe schedule: images -> pre-final-norm tokens.

    Shared by inference (pipeline_forward) and training
    (make_pipeline_train_step) — the schedule is plain differentiable JAX
    (ppermute/psum/where all have exact transposes), so jax.grad through this
    function yields the pipeline BACKWARD schedule for free: cotangents ride
    the inverted ppermute ring stage-by-stage in reverse."""
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
    return jax.shard_map(
        staged, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )(params, x)


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
    tokens = _pipeline_tokens(params, x, config, opts, mesh, num_microbatches)
    tokens = layer_norm(tokens.astype(jnp.float32), params["final_norm"], config.eps)
    out = {
        "cls_token": tokens[:, 0],
        "patch_tokens": tokens[:, 1 + config.num_register_tokens :],
    }
    if classify:
        out["probs"] = forward_head(params, tokens, config, opts)
    return out


def make_pipeline_train_step(
    config: DinoConfig,
    opts: ModelOptions,
    mesh: Mesh,
    optimizer: Any,
    num_microbatches: int = 4,
):
    """Jitted classification train step over the stage mesh (GPipe fwd+bwd).

    The reference has no training (SURVEY.md §2.3); the TP/DP/SP train step
    lives in parallel/train.py. This composes the same loss/optimizer with the
    pipeline schedule: grads flow backward through the stage hand-off because
    _pipeline_tokens is differentiable end-to-end — XLA's transpose of the
    ppermute ring IS the reverse pipeline, and stage-sharded layer params
    receive stage-local gradients (cotangents of their shard_map block), while
    replicated embed/head params get exact psum'd gradients (only stage 0's
    embed path carries signal; the rest are zeroed by the inject `where`).

    Returns (train_step, place): `place(params)` shards layers on 'stage' and
    inits matching optimizer state; `train_step(params, opt_state, x, labels)`
    -> (params, opt_state, metrics)."""
    import optax

    def loss_fn(params, x, labels):
        tokens = _pipeline_tokens(params, x, config, opts, mesh, num_microbatches)
        tokens = layer_norm(
            tokens.astype(jnp.float32), params["final_norm"], config.eps
        )
        from dinov2_tpu.models.vit import head_logits

        logits = head_logits(params, tokens, config, opts)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        acc = (logits.argmax(-1) == labels).mean()
        return loss, acc

    def train_step(params, opt_state, x, labels):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, labels
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    def place(params):
        params = place_pipeline_params(params, mesh)
        opt_state = jax.jit(optimizer.init)(params)
        return params, opt_state

    return jax.jit(train_step, donate_argnums=(0, 1)), place
