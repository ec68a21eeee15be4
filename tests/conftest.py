import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

# Tests exercising multi-device sharding run on a virtual CPU mesh; set up
# before JAX initializes.  Single-chip TPU tests read JAX_PLATFORMS as-is.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

# The default suite never touches the accelerator (on-chip tests are
# env-gated), and accelerator-backend init hangs when the TPU tunnel is
# down; restrict to the CPU backend unless an on-chip gate is set.
# (jax.config, not the env var: a sitecustomize overwrites JAX_PLATFORMS.)
if os.environ.get("ICER_FORCE_CPU") == "1" or not any(
        os.environ.get(k) == "1" for k in
        ("ICER_RUN_ONCHIP", "ICER_RUN_PALLAS_TESTS")):
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import oracle as oracle_mod  # noqa: E402


@pytest.fixture(scope="session")
def oracle():
    """Reference C build (golden oracle); skips if the tree is absent."""
    if not oracle_mod.available():
        pytest.skip("reference tree not available")
    return oracle_mod.get_oracle()


@pytest.fixture()
def rng():
    return np.random.default_rng(12345)


def make_test_image(h, w, rng, dtype=np.uint16, amplitude=200, noise=40):
    """Compressible-but-nontrivial gradient + noise image."""
    base = np.add.outer(np.arange(h) * 3, np.arange(w)).astype(np.int64)
    img = (base % amplitude) + rng.integers(0, noise, (h, w))
    return img.astype(dtype)
