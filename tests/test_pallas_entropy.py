"""Pallas batched state-machine coder vs the sequential reference.

Runs in pallas interpreter mode (no TPU compile round trip); the same
kernel is validated compiled-on-TPU in PERF_NOTES.md.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import os

# Even interpreter-mode pallas execution round-trips through this
# environment's remote compile service (several minutes); validated in
# PERF_NOTES.md, opt in with ICER_RUN_PALLAS_TESTS=1.
pytestmark = pytest.mark.skipif(
    os.environ.get("ICER_RUN_PALLAS_TESTS") != "1",
    reason="slow remote compile; set ICER_RUN_PALLAS_TESTS=1")

import jax.numpy as jnp  # noqa: E402

from icer_compression_tpu.backend import sequential as S  # noqa: E402
from icer_compression_tpu.ops import pallas_entropy as PE  # noqa: E402


@pytest.mark.parametrize("tiled", [False, True])
def test_pallas_coder_matches_sequential(rng, tiled):
    L = 160
    if tiled:
        run = PE.make_encode_lanes_pallas_tiled(L, chunk=80, tile=8,
                                                interpret=True)
    else:
        run = PE.make_encode_lanes_pallas(L, chunk=80, interpret=True)
    LANES = PE.LANES
    ctx = rng.integers(0, 18, (L, LANES)).astype(np.int32)
    p = rng.random((18, LANES))
    bit = (rng.random((L, LANES))
           < p[ctx, np.arange(LANES)[None, :]]).astype(np.int32)
    valid = (rng.random((L, LANES)) < 0.9).astype(np.int32)

    payload, total, flush = PE.encode_lanes_pallas_full(
        jnp.asarray(valid), jnp.asarray(ctx), jnp.asarray(bit), run=run,
        host_post=True)
    payload = np.asarray(payload)
    total = np.asarray(total)
    flush = np.asarray(flush)

    for lane in range(0, LANES, 17):
        pl_s, nb_s, fl = S.encode_emissions(
            valid[:, lane], ctx[:, lane], bit[:, lane])
        assert bool(flush[lane]) == (fl > 0)
        if fl:
            continue
        nb = int(total[lane])
        assert (bytes(payload[lane][: (nb + 7) // 8]), nb) == (pl_s, nb_s)


def test_pallas_coder_golomb_runs(rng):
    # all-zero streams exercise golomb run splitting and flush tails
    L = 128
    run = PE.make_encode_lanes_pallas(L, chunk=64, interpret=True)
    LANES = PE.LANES
    ctx = np.zeros((L, LANES), np.int32)
    bit = np.zeros((L, LANES), np.int32)
    valid = np.ones((L, LANES), np.int32)
    payload, total, flush = PE.encode_lanes_pallas_full(
        jnp.asarray(valid), jnp.asarray(ctx), jnp.asarray(bit), run=run,
        host_post=True)
    pl_s, nb_s, fl = S.encode_emissions(valid[:, 0], ctx[:, 0], bit[:, 0])
    assert not fl
    nb = int(np.asarray(total)[0])
    assert (bytes(np.asarray(payload)[0][: (nb + 7) // 8]), nb) == (pl_s, nb_s)
