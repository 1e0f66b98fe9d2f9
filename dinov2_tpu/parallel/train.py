"""Sharded training step (fine-tune / linear-probe DINOv2 classification).

The reference has no training at all (SURVEY.md: inference-only); this is the new
TPU-native capability that makes the framework production-complete: a full
cross-entropy training step (forward + backward + AdamW) jitted over a
('data', 'model') mesh — batch data-parallel on 'data', Megatron-style
tensor-parallel weight sharding on 'model' (see parallel/mesh.py::param_pspecs).
XLA turns the sharding annotations into psums over ICI; no hand-written
collectives. Encoder remat is available via ModelOptions(remat=True).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dinov2_tpu.image.preprocess import classify_preprocess
from dinov2_tpu.models.config import DinoConfig
from dinov2_tpu.models.vit import ModelOptions, forward_features, head_logits
from dinov2_tpu.parallel.mesh import param_pspecs, shard_batch as _shard_batch


@dataclass
class Trainer:
    """Holds the jitted train step and the sharded state placement logic."""

    config: DinoConfig
    opts: ModelOptions
    optimizer: Any
    mesh: Mesh | None = None
    tensor_parallel: bool = True
    preprocess_in_step: bool = True

    def __post_init__(self):
        from dinov2_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        cfg, opts = self.config, self.opts

        def loss_fn(params, images, labels):
            x = classify_preprocess(images) if self.preprocess_in_step else images
            tokens = forward_features(params, x, cfg, opts)
            logits = head_logits(params, tokens, cfg, opts)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, acc

        def train_step(params, opt_state, images, labels):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, images, labels
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss, "accuracy": acc}

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def place(self, params):
        """Shard params on the mesh (TP on 'model' when present + requested),
        then init the optimizer state so it inherits the same shardings."""
        if self.mesh is None:
            opt_state = jax.jit(self.optimizer.init)(params)
            return params, opt_state
        tp = self.tensor_parallel and "model" in self.mesh.axis_names
        specs = (
            param_pspecs(params)
            if tp
            else jax.tree_util.tree_map(lambda _: P(), params)
        )
        params = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)), params, specs
        )
        opt_state = jax.jit(self.optimizer.init)(params)
        return params, opt_state

    def shard_batch(self, images, labels):
        if self.mesh is None:
            return jnp.asarray(images), jnp.asarray(labels)
        # mesh.shard_batch replicates when the 'data' axis is absent, so a
        # pure-'model' TP mesh (which place() supports) doesn't ValueError here
        return (
            _shard_batch(jnp.asarray(images), self.mesh),
            _shard_batch(jnp.asarray(labels), self.mesh),
        )

    def step(self, params, opt_state, images, labels):
        images, labels = self.shard_batch(images, labels)
        if self.mesh is not None and self.opts.sequence_parallel:
            # sequence-parallel constraints resolve bare PartitionSpecs against
            # the ambient mesh
            with jax.sharding.set_mesh(self.mesh):
                return self._train_step(params, opt_state, images, labels)
        return self._train_step(params, opt_state, images, labels)


def make_trainer(
    config: DinoConfig,
    mesh: Mesh | None = None,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.05,
    opts: ModelOptions | None = None,
    tensor_parallel: bool = True,
    preprocess_in_step: bool = True,
) -> Trainer:
    opts = opts or ModelOptions(
        parity="hf", compute_dtype=jnp.float32, remat=True
    )
    optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)
    return Trainer(
        config=config,
        opts=opts,
        optimizer=optimizer,
        mesh=mesh,
        tensor_parallel=tensor_parallel,
        preprocess_in_step=preprocess_in_step,
    )
