"""Inference engine: load -> jit -> predict (the TPU-native `dino_predict`).

Reference behavior being reproduced (/root/reference/dinov2.cpp:900-999 and
inference.cpp): per-image classify (top-k over softmax probs) and feature
extraction (patch tokens -> PCA visualization), with the preprocessing modes and
quirks of SURVEY.md. Differences by design:

  - batch-first: predict() takes any number of images; same-sized images compile
    to ONE program and run as one batched MXU-bound forward (the reference loops
    one image at a time on CPU threads).
  - jit caching: programs are cached per (batch bucket, image grid); batch sizes
    are bucketed to powers of two to bound recompilation.
  - optional data-parallel sharding over a device mesh ('data' axis); params are
    replicated once at load.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_tpu.image.pca import pca_visualization_batch, resize_nearest_host
from dinov2_tpu.image.preprocess import classify_preprocess, feature_preprocess
from dinov2_tpu.models.params import load_params
from dinov2_tpu.models.vit import ModelOptions, forward
from dinov2_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from dinov2_tpu.utils.debug import check_finite
from dinov2_tpu.utils.logging import log_model_banner
from dinov2_tpu.utils.timing import time_blocked


def _bucket(n: int) -> int:
    """Round batch up to a power of two (1,2,4,...) to bound jit cache size."""
    b = 1
    while b < n:
        b *= 2
    return b


class DinoEngine:
    def __init__(
        self,
        model_path: str | Path,
        dtype=jnp.bfloat16,
        quant_mode: str = "dequant",
        parity: str = "reference",
        flash_attention="auto",
        data_parallel: bool = False,
        mesh_axes: dict[str, int] | None = None,
    ):
        """mesh_axes: explicit mesh, e.g. {'data': 4, 'model': 2} — batch sharded
        on 'data', weights Megatron-sharded on 'model' (giant-model latency).
        data_parallel=True is shorthand for a 1-D all-device 'data' mesh."""
        from dinov2_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        if quant_mode == "fused" and mesh_axes and "model" in mesh_axes:
            # Megatron TP x fused-quant runs via parallel/tp_fused.py when the
            # head count splits over the 'model' axis; otherwise dequant.
            from dinov2_tpu.io.gguf import GGUFReader
            from dinov2_tpu.models.config import DinoConfig

            r = GGUFReader(model_path)
            peek = DinoConfig.from_gguf_kv(r.kv)
            r.close()
            if peek.num_attention_heads % mesh_axes["model"]:
                from dinov2_tpu.utils.logging import get_logger

                get_logger().warning(
                    "%d heads do not split over tp=%d; falling back to "
                    "quant_mode='dequant'",
                    peek.num_attention_heads, mesh_axes["model"],
                )
                quant_mode = "dequant"
        self.loaded = load_params(model_path, dtype=dtype, quant_mode=quant_mode)
        self.config = self.loaded.config
        self.id2label = self.loaded.id2label
        self.opts = ModelOptions(
            parity=parity, flash_attention=flash_attention, compute_dtype=dtype
        )
        self.mesh = None
        self.params = self.loaded.params
        self._sm_forward = None
        tp_fused = (
            quant_mode == "fused"
            and self.loaded.quantized
            and mesh_axes is not None
            and "model" in mesh_axes
        )
        if mesh_axes is not None:
            self.mesh = make_mesh(mesh_axes)
            if tp_fused:
                # Megatron TP with packed weights: explicit shard_map
                # collectives (pallas_call has no GSPMD partitioning rule)
                from dinov2_tpu.parallel.tp_fused import (
                    make_tp_forward,
                    tp_place_params,
                    tp_prepare_params,
                )

                try:
                    ptp, specs = tp_prepare_params(
                        self.loaded.params, self.config, tp=mesh_axes["model"]
                    )
                except ValueError as e:
                    from dinov2_tpu.utils.logging import get_logger

                    get_logger().warning(
                        "TP x fused-quant unavailable (%s); falling back to "
                        "quant_mode='dequant'", e,
                    )
                    tp_fused = False
                    quant_mode = "dequant"
                    self.loaded = load_params(
                        model_path, dtype=dtype, quant_mode="dequant"
                    )
                    self.params = self.loaded.params
                else:
                    self.params = tp_place_params(ptp, specs, self.mesh)
                    self._jit_sm_forward = make_tp_forward(
                        specs, self.config, self.opts, self.mesh
                    )
                    self._sm_forward = self._jit_sm_forward
            if not tp_fused:
                from dinov2_tpu.parallel.mesh import shard_params

                tensor_parallel = "model" in mesh_axes
                if tensor_parallel and quant_mode == "int8":
                    # param_pspecs has no Megatron split for Int8Linear (the
                    # per-row scales would need the same row/col split as the
                    # codes); sharding only the dense biases while replicating
                    # the kernels buys nothing — replicate coherently instead
                    from dinov2_tpu.utils.logging import get_logger

                    get_logger().warning(
                        "int8 weights are not tensor-parallel sharded; "
                        "replicating over the %d-way 'model' axis",
                        mesh_axes["model"],
                    )
                    tensor_parallel = False
                self.params = shard_params(
                    self.params, self.mesh, tensor_parallel=tensor_parallel
                )
        elif data_parallel and len(jax.devices()) > 1:
            self.mesh = make_mesh()
            self.params = replicate(self.params, self.mesh)
        # Fused quantized matmul under a pure-data mesh: the whole forward
        # runs per-device on its local batch shard via shard_map (pure DP, no
        # collectives inside). The non-fused paths keep the sharding-
        # annotation route (XLA propagates).
        if (
            self._sm_forward is None
            and quant_mode == "fused"
            and self.mesh is not None
            and self.loaded.quantized
        ):
            from functools import partial

            from dinov2_tpu.parallel.mesh import shard_map_data_parallel

            self._sm_forward = {
                classify: shard_map_data_parallel(
                    partial(
                        forward,
                        config=self.config,
                        opts=self.opts,
                        classify=classify,
                    ),
                    self.mesh,
                )
                for classify in (False, True)
            }
            self._jit_sm_forward = {
                c: jax.jit(f) for c, f in self._sm_forward.items()
            }
        log_model_banner(self.config, str(model_path))
        self.last_compute_ms = 0.0
        self._jit_classify_pre = jax.jit(classify_preprocess)
        self._jit_feature_pre = jax.jit(feature_preprocess, static_argnums=(1,))
        # bound method: positional args are (params, x, p, gh, gw)
        self._jit_pca = jax.jit(self._pca_full, static_argnums=(2, 3, 4))

    # ------------------------------------------------------------------
    def _stack_batch(self, images: Sequence[np.ndarray] | np.ndarray) -> np.ndarray:
        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = images[None]
        batch = np.stack(list(images), axis=0)
        if batch.ndim != 4 or batch.shape[-1] != 3:
            raise ValueError("expected RGB images (B, H, W, 3)")
        return batch

    def _group_by_shape(self, images) -> list[tuple[list[int], np.ndarray]]:
        """Group mixed-size images by (H, W) so each group preprocesses with one
        compiled program (classify outputs are all 224x224, so groups merge into
        one forward batch afterwards)."""
        if isinstance(images, np.ndarray):
            images = [images] if images.ndim == 3 else list(images)
        groups: dict[tuple[int, int], list[int]] = {}
        for i, img in enumerate(images):
            groups.setdefault((img.shape[0], img.shape[1]), []).append(i)
        return [
            (idxs, np.stack([images[i] for i in idxs], axis=0))
            for idxs in groups.values()
        ]

    @staticmethod
    def _pad_rows(batch: np.ndarray, target: int) -> np.ndarray:
        """Pad a host batch to `target` rows by repeating the last row (the
        one home of this edge-pad; device-side padding lives in _bucket_pad)."""
        if target == batch.shape[0]:
            return batch
        return np.concatenate(
            [batch, np.repeat(batch[-1:], target - batch.shape[0], axis=0)], axis=0
        )

    def _target_batch(self, n: int) -> int:
        """Bucketed batch size: power of two (bounds the jit cache), rounded
        up to a multiple of the mesh's 'data'-axis size — the batch is sharded
        only on 'data' (shard_batch replicates on a pure-'model' TP mesh, so
        rounding to the TOTAL device count there would over-pad for nothing)."""
        bucket = _bucket(n)
        if self.mesh is not None:
            mult = dict(self.mesh.shape).get("data", 1)
            bucket = -(-max(bucket, mult) // mult) * mult
        return bucket

    def _bucket_pad(self, x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
        """Pad a device batch up to the bucket size (and shard over the mesh)."""
        n = x.shape[0]
        bucket = self._target_batch(n)
        if bucket != n:
            pad = jnp.broadcast_to(x[-1:], (bucket - n, *x.shape[1:]))
            x = jnp.concatenate([x, pad], axis=0)
        if self.mesh is not None:
            x = shard_batch(x, self.mesh)
        return x, n

    def _device_batch(self, batch: np.ndarray) -> tuple[jnp.ndarray, int]:
        n = batch.shape[0]
        # pad on host — the padding never crosses PCIe twice
        x = jnp.asarray(self._pad_rows(batch, self._target_batch(n)))
        if self.mesh is not None:
            x = shard_batch(x, self.mesh)
        return x, n

    # ------------------------------------------------------------------
    def _run_forward(self, x: jnp.ndarray, classify: bool):
        """Dispatch the jitted forward: shard_map route for fused-quant on a
        mesh, plain (sharding-annotated) jit otherwise."""
        if self._sm_forward is not None:
            return self._jit_sm_forward[classify](self.params, x)
        return forward(self.params, x, self.config, self.opts, classify=classify)

    # ------------------------------------------------------------------
    def classify(
        self, images: Sequence[np.ndarray] | np.ndarray, topk: int = 5
    ) -> list[list[tuple[str, float]]]:
        """RGB uint8 images (same size) -> per-image top-k (label, prob)."""
        probs = self.classify_probs(images)
        out = []
        for row in probs:
            idx = np.argsort(row)[::-1][:topk]
            out.append([(self.id2label.get(int(i), str(int(i))), float(row[i])) for i in idx])
        return out

    def classify_probs(self, images) -> np.ndarray:
        """Mixed-size images are allowed: preprocessing runs per size group
        (each its own compiled program), the forward runs once on the merged
        224x224 batch."""
        if not self.loaded.has_classifier:
            raise ValueError("checkpoint has no classifier head")
        groups = self._group_by_shape(images)
        if not groups:
            return np.zeros((0, self.config.num_classes), dtype=np.float32)

        def run():
            if len(groups) == 1:
                # hot serving path: one size group arrives already in order, so
                # pad straight to the forward's target batch before the jitted
                # preprocess and feed it through — no slice-then-re-pad round
                # trip on device (the target set is still log2-bounded)
                idxs, batch = groups[0]
                n = len(idxs)
                pre = self._jit_classify_pre(
                    jnp.asarray(self._pad_rows(batch, self._target_batch(n)))
                )
                if self.mesh is not None:
                    pre = shard_batch(pre, self.mesh)
                return self._run_forward(pre, classify=True), n
            order, parts = [], []
            for idxs, batch in groups:
                order.extend(idxs)
                # pad the group count to its bucket BEFORE preprocessing, so
                # per-(H, W) preprocess programs stay log2-bounded instead of
                # one per exact coalesced group size (the bucket/grid cache
                # contract); the padded rows are sliced off right here
                nb = _bucket(batch.shape[0])
                parts.append(
                    self._jit_classify_pre(jnp.asarray(self._pad_rows(batch, nb)))[
                        : len(idxs)
                    ]
                )
            pre = jnp.concatenate(parts, axis=0)
            inv = np.argsort(np.asarray(order))
            pre = pre[jnp.asarray(inv)]
            pre, n = self._bucket_pad(pre)
            return self._run_forward(pre, classify=True), n

        (out, n), ms = time_blocked(run)
        self.last_compute_ms = ms
        check_finite(out, "classify:")
        return np.asarray(out["probs"])[:n]

    # ------------------------------------------------------------------
    def extract_features(self, images) -> dict[str, Any]:
        """Feature mode: preprocess (patch-multiple resize), forward, return
        cls_token (B, D), patch_tokens (B, N, D) and the patch grid.

        Images must share one size (the patch grid is shape-defining); use
        extract_features_mixed for a mixed-size list."""
        batch = self._stack_batch(images)
        x, n = self._device_batch(batch)
        p = self.config.patch_size
        h, w = batch.shape[1], batch.shape[2]

        def run(x):
            pre = self._jit_feature_pre(x, p)
            return self._run_forward(pre, classify=False)

        out, ms = time_blocked(run, x)
        self.last_compute_ms = ms
        check_finite(out, "features:")
        gh, gw = (h // p + 1), (w // p + 1)  # quirk Q4 target grid
        return {
            "cls_token": np.asarray(out["cls_token"])[:n],
            "patch_tokens": np.asarray(out["patch_tokens"])[:n],
            "grid": (gh, gw),
        }

    def extract_features_mixed(self, images) -> list[dict[str, Any]]:
        """Mixed-size feature extraction: groups by (H, W), one batched forward
        per group (grids differ per size, so outputs are per-image dicts)."""
        groups = self._group_by_shape(images)
        n_total = sum(len(idxs) for idxs, _ in groups)
        results: list[dict[str, Any] | None] = [None] * n_total
        for idxs, batch in groups:
            feats = self.extract_features(batch)
            for row, i in enumerate(idxs):
                results[i] = {
                    "cls_token": feats["cls_token"][row],
                    "patch_tokens": feats["patch_tokens"][row],
                    "grid": feats["grid"],
                }
        return results  # type: ignore[return-value]

    # ------------------------------------------------------------------
    def _pca_full(
        self, params, x: jnp.ndarray, p: int, gh: int, gw: int
    ) -> jnp.ndarray:
        """Fused preprocess -> forward -> per-image PCA for a whole (B, H, W, 3)
        batch, one device dispatch (the realtime loop's hot path; reference
        rebuilds its graph per frame, realtime.cpp:65-70). `params` rides as a
        jit ARGUMENT — closing over it would embed the weights as HLO
        constants (huge compile payloads)."""
        pre = feature_preprocess(x, p)
        if self._sm_forward is not None:
            out = self._sm_forward[False](params, pre)
        else:
            out = forward(params, pre, self.config, self.opts, classify=False)
        # grid-sized output: the host replicates pixels (p^2 x smaller
        # device->host transfer — through a tunnel-attached TPU this halves
        # the whole realtime frame time)
        return pca_visualization_batch(out["patch_tokens"], (gh, gw))

    def _pca_batch(self, batch: np.ndarray) -> np.ndarray:
        """Same-size images (B, H, W, 3) -> (B, H, W, 3) uint8 PCA images at
        the ORIGINAL input size (the reference nearest-resizes the grid-sized
        visualization straight back to the input's size,
        /root/reference/inference.cpp:89-91; the device returns the grid and
        the host does the resize — a ~p² smaller device->host transfer)."""
        p = self.config.patch_size
        gh, gw = batch.shape[1] // p + 1, batch.shape[2] // p + 1
        x, n = self._device_batch(batch)  # pads to bucket/mesh multiple
        vis, ms = time_blocked(self._jit_pca, self.params, x, p, gh, gw)
        self.last_compute_ms = ms
        return resize_nearest_host(
            np.asarray(vis)[:n], batch.shape[1], batch.shape[2]
        )

    def pca_visualization(self, image: np.ndarray) -> np.ndarray:
        """One RGB image -> uint8 PCA visualization at the original image size
        (reference contract: grid -> INTER_NEAREST resize to original_size,
        inference.cpp:89-91)."""
        img = image[None] if image.ndim == 3 else image
        return self._pca_batch(np.asarray(img))[0]

    def pca_visualization_async(self, image: np.ndarray) -> jnp.ndarray:
        """Dispatch one frame's fused preprocess+forward+PCA WITHOUT blocking;
        returns the on-device uint8 result (np.asarray it to wait). JAX's async
        dispatch means the caller can grab/decode the NEXT frame while this one
        uploads and computes — the realtime loop's double-buffering primitive
        (the reference's loop is fully synchronous, realtime.cpp:55-100)."""
        img = image[None] if image.ndim == 3 else image
        batch = np.asarray(img)
        p = self.config.patch_size
        gh, gw = batch.shape[1] // p + 1, batch.shape[2] // p + 1
        x, _ = self._device_batch(batch)
        # returns the (bucket, h, w, 3) device array — callers index row 0
        # AFTER np.asarray; an eager [0] here would dispatch a separate
        # gather program per frame (a full RPC round-trip on tunnel-attached
        # devices)
        return self._jit_pca(self.params, x, p, gh, gw)

    def pca_visualizations(self, images) -> list[np.ndarray]:
        """Mixed-size images -> per-image uint8 PCA visualizations: grouped by
        (H, W), ONE fused preprocess+forward+vmapped-PCA program per group."""
        groups = self._group_by_shape(images)
        n_total = sum(len(idxs) for idxs, _ in groups)
        out: list[np.ndarray | None] = [None] * n_total
        for idxs, batch in groups:
            vis = self._pca_batch(batch)
            for row, i in enumerate(idxs):
                out[i] = vis[row]
        return out  # type: ignore[return-value]

    # ------------------------------------------------------------------
    def warmup(self, image_hw: tuple[int, int], batch: int = 1, classify: bool = True):
        """Compile ahead of time for a given input size."""
        dummy = np.zeros((batch, *image_hw, 3), dtype=np.uint8)
        if classify and self.loaded.has_classifier:
            self.classify_probs(dummy)
        else:
            self.extract_features(dummy)
