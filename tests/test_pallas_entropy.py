"""Pallas batched state-machine coder vs the sequential reference.

Runs in pallas interpreter mode (no TPU compile round trip); the same
kernel is validated compiled-on-TPU in PERF_NOTES.md.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
# All tests run interpret-mode on the suite's pinned CPU backend (~20 s
# total with the small shapes below), so the whole file rides the default
# tier.

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


@pytest.mark.parametrize("fused", [True, False])
def test_slim_coder_matches_sequential(rng, fused):
    """Slim kernel (packed IO, deferred codeword construction, in-kernel
    alloc indices) + ordering sort + pack vs the sequential reference
    coder, in both record formats (fused-key single word / legacy
    two-word)."""
    L = 256
    LANES = 128
    ctx = rng.integers(0, 18, (L, LANES)).astype(np.int32)
    p = rng.random((18, LANES))
    bit = (rng.random((L, LANES))
           < p[ctx, np.arange(LANES)[None, :]]).astype(np.int32)
    valid = (rng.random((L, LANES)) < 0.9).astype(np.int32)
    # all-zero golomb-run lanes (flush tails) in the last columns
    valid[:, -4:] = 1
    ctx[:, -4:] = 0
    bit[:, -4:] = 0

    run = PE.make_encode_lanes_slim(L, chunk=64, interpret=True,
                                    lanes=LANES, fused_key=fused)
    with jax.default_device(jax.devices("cpu")[0]):
        outs = run(jnp.asarray(PE.pack_emissions(valid, ctx, bit, np)))
        if fused:
            rec, fs, mo, ev = outs
            ops = np.asarray(PE.slim_sort_operand_packed(rec, fs, ev, jnp))
            nrec = (ops >> 16 != PE.BIG15).sum(axis=0)
        else:
            r1, r2, fs, mo, ev1, ev2 = outs
            ops, keys = map(np.asarray, PE.slim_sort_operands(
                r1, r2, fs, jnp, ev1, ev2))
            nrec = (keys != PE.BIG).sum(axis=0)
        kflush = np.asarray(mo[0]) != 0
        nalloc = np.asarray(mo[1])
    mb = ((3 * L // 2 + 170 + 255) // 256) * 256
    for lane in list(range(0, LANES, 17)) + [126, 127]:
        if fused:
            pl, t, f = PE.order_and_pack_lane_packed(ops[:, lane], np,
                                                     max_bits=mb)
        else:
            pl, t, f = PE.order_and_pack_lane_slim(
                ops[:, lane], keys[:, lane], np, max_bits=mb)
        pl_s, nb_s, fl = S.encode_emissions(
            valid[:, lane] != 0, ctx[:, lane], bit[:, lane])
        assert bool(kflush[lane]) == (fl > 0)
        if fl:
            continue
        assert not bool(f)
        assert (bytes(pl[: (int(t) + 7) // 8]), int(t)) == (pl_s, nb_s)
        # the allocation counter counts every real record (incl. tails)
        assert int(nalloc[lane]) == int(nrec[lane])


def test_slim_kernel_buffer_eviction(rng):
    """The in-kernel CIRC_BUF eviction reproduces the sequential coder
    exactly: one bin held open while >= CIRC_BUF_SIZE codewords allocate
    behind it forces a mid-plane flush of the oldest open codeword
    (icer_encoding.c:59-64), now handled inside the kernel (eviction
    record into the bounded side buffer) instead of flagging a host
    fallback."""
    # 64 ctx-0 zeros adapt the counters into golomb bins and leave (at
    # least) one run open as the bin index drifts upward; ctx-17
    # (uncoded) emissions then allocate one codeword each behind it
    L = 2432
    LANES = 128
    warm = 64
    n_unc = np.arange(LANES) * 17 + 90
    valid = np.ones((L, LANES), np.int32)
    ctx = np.full((L, LANES), 17, np.int32)
    bit = rng.integers(0, 2, (L, LANES)).astype(np.int32)
    ctx[:warm] = 0
    bit[:warm] = 0
    mask = np.arange(L - warm)[:, None] >= n_unc[None, :]
    valid[warm:] = np.where(mask, 0, 1)

    run = PE.make_encode_lanes_slim(L, chunk=128, interpret=True,
                                    lanes=LANES)
    assert run.fused_key
    with jax.default_device(jax.devices("cpu")[0]):
        rec, fs, mo, ev = run(
            jnp.asarray(PE.pack_emissions(valid, ctx, bit, np)))
        ops = np.asarray(PE.slim_sort_operand_packed(rec, fs, ev, jnp))
        kflush = np.asarray(mo[0]) != 0
        nev = np.asarray(mo[2])
    assert not kflush.any()          # side buffer never overflows here
    evicted = 0
    for lane in range(0, LANES, 13):
        pl_s, nb_s, fl = S.encode_emissions(
            valid[:, lane] != 0, ctx[:, lane], bit[:, lane])
        # eviction counts match the sequential coder's flush_events
        assert int(nev[lane]) == fl, lane
        evicted += fl > 0
        pl, t, f = PE.order_and_pack_lane_packed(
            ops[:, lane], np,
            max_bits=((3 * L // 2 + 170 + 255) // 256) * 256)
        assert not bool(f)
        assert (bytes(pl[: (int(t) + 7) // 8]), int(t)) == (pl_s, nb_s), lane
    # sanity: the construction actually crosses the boundary somewhere
    assert evicted and nev.max() >= 1 and not nev.all()


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
