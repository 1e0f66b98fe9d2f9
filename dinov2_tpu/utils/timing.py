"""Wall-clock timing with device synchronization.

Mirrors the reference's timed-region contract: the compute bracket is closed with
a device sync before reading the clock (ggml_backend_synchronize + ggml_time_ms,
/root/reference/inference.cpp:62-68). In JAX that is block_until_ready().
"""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    def __init__(self):
        self.elapsed_ms = 0.0

    @contextlib.contextmanager
    def measure(self, result_to_block_on=None):
        start = time.perf_counter()
        try:
            yield self
        finally:
            if result_to_block_on is not None:
                jax.block_until_ready(result_to_block_on)
            self.elapsed_ms = (time.perf_counter() - start) * 1e3


def time_blocked(fn, *args, **kwargs):
    """Run fn, block on its outputs, return (outputs, elapsed_ms)."""
    start = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - start) * 1e3
