"""Test config: force an 8-device virtual CPU platform so sharding tests
exercise real multi-device paths without TPU hardware (SURVEY §7 Phase 3
validation strategy).

TPU tier: set ``TPU3DTK_TEST_PLATFORM=tpu`` to run the suite against the
real chip instead (used for the accuracy/kernel-equivalence tier — the
round-3 lesson was that a CPU-only suite cannot see TPU matmul-precision
accuracy failures).  Recipe:

    TPU3DTK_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_accuracy.py -q

Note: the axon sitecustomize hook calls jax.config.update with
jax_platforms="axon,cpu", which overrides the JAX_PLATFORMS env var —
tests must override via jax.config, not the environment.
"""

import os

TEST_PLATFORM = os.environ.get("TPU3DTK_TEST_PLATFORM", "cpu")

# keep the persistent XLA cache out of the test tier: entries compiled
# by the tunnel-side toolchain carry machine features the local CPU
# lacks (AOT loader warns about possible SIGILL)
os.environ.setdefault("TPU3DTK_XLA_CACHE", "")

if TEST_PLATFORM == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if TEST_PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
# any other value leaves the platform stack alone (the axon sitecustomize
# already selects the hardware backend; naming it explicitly would break
# under the tunnel's platform alias)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DAT = "/root/reference/dat"


@pytest.fixture(scope="session")
def dat_dir():
    if not os.path.isdir(REFERENCE_DAT):
        pytest.skip("reference dat/ not available")
    return REFERENCE_DAT


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_room_cloud(rng, n=4000, size=1000.0):
    """Synthetic 'room': points on the walls of a box — well-constrained
    geometry for registration tests (same spirit as the reference's
    icosphere fixtures, testing/data/icosphere/)."""
    n_face = n // 6
    pts = []
    for axis in range(3):
        for side in (0.0, size):
            p = rng.uniform(0, size, size=(n_face, 3))
            p[:, axis] = side
            pts.append(p)
    return np.concatenate(pts, axis=0)
