"""Training checkpoint/resume via Orbax.

The reference's only persistence is the GGUF file (SURVEY.md §5); inference-side
interop stays GGUF (io/gguf.py, io/export.py). This module adds what training
needs: full train-state snapshots (params + optimizer state + step) that restore
with the correct shardings on a mesh.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp


def save_train_state(
    directory: str | Path, step: int, params: Any, opt_state: Any
) -> None:
    directory = Path(directory).resolve()
    with ocp.CheckpointManager(directory) as mgr:
        mgr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )
        mgr.wait_until_finished()


def restore_train_state(
    directory: str | Path,
    params_like: Any,
    opt_state_like: Any,
    step: int | None = None,
) -> tuple[int, Any, Any]:
    """Restore (step, params, opt_state). `*_like` provide structure/sharding
    targets (e.g. freshly-initialized, already device_put on the mesh)."""
    directory = Path(directory).resolve()
    with ocp.CheckpointManager(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params_like),
                opt_state=ocp.args.StandardRestore(opt_state_like),
            ),
        )
    return step, restored["params"], restored["opt_state"]
