"""Threaded image-loading pipeline: decode on host threads, prefetch batches.

The reference's data path is a single cv2.imread on the main thread
(inference.cpp:36). For batched TPU serving the host side must keep the device
fed: this loader decodes JPEGs on a thread pool (cv2's decoder is native C++ and
releases the GIL) and prefetches assembled batches through a bounded queue so
host decode overlaps device compute.
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np

IMAGE_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def list_images(root: str | Path) -> list[Path]:
    root = Path(root)
    if root.is_file():
        return [root]
    return sorted(
        p for p in root.rglob("*") if p.suffix.lower() in IMAGE_EXTENSIONS
    )


def decode_rgb(path: str | Path) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path))
    if img is None:
        raise ValueError(f"failed to decode {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class _ProducerError:
    """Marker carrying a producer-thread exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class BatchLoader:
    """Iterates (paths, images) batches with threaded decode and prefetch.

    Images are resized on the host to a common (h, w) so batches are
    rectangular. Two host-resize modes:

      - interpolation="cubic-float" (classification-accurate): float32/255
        first, then cv2.INTER_CUBIC — byte-matching the reference preprocessing
        order (/root/reference/dinov2.cpp:106-121: convertTo(CV_32FC3, 1/255)
        before resize). The engine's on-device bicubic resize to the same size
        is then the identity, so the effective pipeline equals the reference's.
      - interpolation="nearest" (uint8, like the reference's realtime frame
        resize, realtime.cpp:62): cheap; the engine's on-device bicubic does the
        model-accurate resize from this common size.
    """

    def __init__(
        self,
        paths: Iterable[str | Path],
        batch_size: int = 32,
        size: tuple[int, int] | None = (518, 518),
        num_threads: int = 8,
        prefetch: int = 2,
        interpolation: str = "nearest",
    ):
        self.paths = [Path(p) for p in paths]
        self.batch_size = batch_size
        self.size = size
        self.num_threads = num_threads
        self.prefetch = prefetch
        if interpolation not in ("nearest", "cubic-float"):
            raise ValueError(f"unknown interpolation {interpolation!r}")
        self.interpolation = interpolation

    def _decode(self, path: Path) -> np.ndarray:
        import cv2

        img = decode_rgb(path)
        if self.size is None:
            return img
        if self.interpolation == "cubic-float":
            img = img.astype(np.float32) / 255.0
            return cv2.resize(
                img, (self.size[1], self.size[0]), interpolation=cv2.INTER_CUBIC
            )
        return cv2.resize(
            img, (self.size[1], self.size[0]), interpolation=cv2.INTER_NEAREST
        )

    def __len__(self) -> int:
        return (len(self.paths) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[tuple[list[Path], np.ndarray]]:
        batches = [
            self.paths[i : i + self.batch_size]
            for i in range(0, len(self.paths), self.batch_size)
        ]
        out: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # The sentinel/error marker MUST reach the consumer even if a
            # decode raises (corrupt file), else the consumer blocks forever
            # on out.get().
            try:
                with concurrent.futures.ThreadPoolExecutor(self.num_threads) as pool:
                    for chunk in batches:
                        if stop.is_set():
                            return
                        imgs = list(pool.map(self._decode, chunk))
                        out.put((chunk, np.stack(imgs, axis=0)))
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                out.put(_ProducerError(e))
            else:
                out.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out.get()
                if item is None:
                    return
                if isinstance(item, _ProducerError):
                    raise item.exc
                yield item
        finally:
            stop.set()
            # Unblock a producer stuck on a full queue so its pool can exit.
            try:
                while True:
                    out.get_nowait()
            except queue.Empty:
                pass
