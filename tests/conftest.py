"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding is exercised without TPUs (the standard JAX testing recipe)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # override the session's axon TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough here: the axon TPU plugin registers itself
# via sitecustomize before conftest runs, so pin the platform through config.
jax.config.update("jax_platforms", "cpu")

# f32 matmuls default to bfloat16 MXU precision; golden-value tests need the
# exact path (the library exposes precision control for the TPU perf path).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_txt(path, rows):
    """Write a 5-column tab-separated trajectory file."""
    with open(path, "w") as f:
        for r in rows:
            f.write("\t".join(str(float(x)) for x in r) + "\n")


@pytest.fixture
def tiny_dataset_dir(tmp_path):
    """A tiny synthetic 5-col dataset: 25 frames, 4 peds.

    - peds 1,2 share group 1 and walk right;
    - ped 3 group 2 walks up;
    - ped 4 ungrouped (0) walks diagonally, joins late (frame 30) so it is
      absent from the earliest windows.
    """
    rows = []
    for t in range(25):
        fr = t * 10
        rows.append([fr, 1, 0.1 * t, 1.0, 1])
        rows.append([fr, 2, 0.1 * t + 0.5, 1.2, 1])
        rows.append([fr, 3, 2.0, 0.1 * t, 2])
        if t >= 3:
            rows.append([fr, 4, 0.07 * t, 0.07 * t, 0])
    d = tmp_path / "train"
    d.mkdir()
    make_txt(d / "scene.txt", rows)
    return str(d)
