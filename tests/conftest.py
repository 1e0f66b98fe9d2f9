"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere, so this sits at the top of
conftest. The real-TPU path is exercised by bench.py / __graft_entry__.py instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin in this image overrides JAX_PLATFORMS; the config knob wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402
from pathlib import Path  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Self-heal the foreign-writer GGUF fixture: it is committed, but if an
# over-eager `git clean -xdf` lost it locally, regenerate it from its
# deterministic generator so the suite never fails on missing binary state.
# Under `make clean-check` (DINOV2_TPU_NO_FIXTURE_SELFHEAL=1) the self-heal is
# DISABLED so the gate keeps its promise: a fixture that was never committed
# fails the clean-worktree run instead of being silently papered over.
_FOREIGN = Path(__file__).parent / "fixtures" / "foreign_v3.gguf"
if not _FOREIGN.exists():
    import os
    import subprocess

    if os.environ.get("DINOV2_TPU_NO_FIXTURE_SELFHEAL"):
        raise RuntimeError(
            f"{_FOREIGN} is missing from this checkout and the fixture "
            "self-heal is disabled (clean-check mode): the fixture was not "
            "committed. Run `git add -f tests/fixtures/foreign_v3.gguf`."
        )
    subprocess.run(
        [sys.executable, str(_FOREIGN.parent / "gen_foreign_gguf.py")], check=True
    )


@pytest.fixture
def rng():
    return np.random.default_rng(42)
