#!/usr/bin/env python
"""Standalone on-chip timing of the fused encoder's post-kernel data
movement at the real B=21 big-bucket shapes: record concat, the
lanes-major transpose feeding the vmapped tail, the payload flatten
slices, the blob concat and the compact tile gather.  All variants
return a small checksum so fetch is constant; deltas between steps give
each op's cost.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def bench(fn, *args, reps=5):
    t0 = time.time()
    np.asarray(fn(*args))
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return comp, min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from icer_compression_tpu.ops.encode_jax import _ensure_cache
    _ensure_cache()

    L, W = 22016, 3072          # big-bucket kernel output block
    NT = 49                     # tail + eviction rows
    Lc = 16512
    rng = np.random.default_rng(0)
    rec = jnp.asarray(rng.integers(0, 1 << 30, (L, W), dtype=np.int32))
    tail = jnp.asarray(rng.integers(0, 1 << 30, (NT, W), dtype=np.int32))

    @jax.jit
    def base(r, t):
        return r.sum() + t.sum()

    @jax.jit
    def concat(r, t):
        return jnp.concatenate([r, t]).sum()

    @jax.jit
    def transpose(r, t):
        cc = jnp.concatenate([r, t])
        return jnp.swapaxes(cc, 0, 1).sum(axis=-1)[::7].sum()

    @jax.jit
    def tsort(r, t):
        cc = jnp.concatenate([r, t]).T
        s = jnp.sort(cc, axis=-1, stable=False)
        return s[:, :Lc].sum()

    @jax.jit
    def rsort(r, t):
        # sort along the ROW axis of the row-major layout (no transpose):
        # semantically what the per-lane ordering sort needs
        cc = jnp.concatenate([r, t])
        s = jnp.sort(cc, axis=0, stable=False)
        return s[:Lc, :].sum()

    # payload flatten + blob + compact gather at real sizes
    rows, capw = 3402, 516
    payload = jnp.asarray(rng.integers(0, 1 << 30, (rows, capw),
                                       dtype=np.int32))
    nbits = jnp.asarray(rng.integers(0, capw * 32, (rows,), dtype=np.int32))
    cap_tiles = np.full((rows,), capw // 8, np.int32)
    tile_off = np.arange(rows, dtype=np.int64) * (capw // 8)
    BT = int(0.62 * rows * capw // 8) // 8 * 8

    @jax.jit
    def gather(payload, nbits):
        tiles = jnp.clip((nbits + 255) >> 8, 0, jnp.asarray(cap_tiles))
        toff = jnp.cumsum(tiles) - tiles
        mark = jnp.zeros((BT,), jnp.int32).at[
            jnp.clip(toff, 0, BT - 1)].add(1)
        lane_of = jnp.cumsum(mark) - 1
        src = (jnp.asarray(tile_off.astype(np.int32))[lane_of]
               + jnp.arange(BT, dtype=jnp.int32) - toff[lane_of])
        pt = payload.reshape(-1, 8)
        dense = pt[jnp.clip(src, 0, pt.shape[0] - 1)]
        return dense.sum()

    B, P, N = 21, 9, 18

    @jax.jit
    def flatten(payload):
        blk4 = payload[: B * P * N].reshape(B, P, N, capw)
        pieces = []
        for pi in range(P):
            cw = max(8, (capw // (1 + pi)) // 8 * 8)
            pieces.append(blk4[:, pi, :, :cw].reshape(-1))
        return jnp.concatenate(pieces).sum()

    for name, fn, args in [
        ("base sums", base, (rec, tail)),
        ("concat", concat, (rec, tail)),
        ("concat+T", transpose, (rec, tail)),
        ("T + minor-axis sort", tsort, (rec, tail)),
        ("major-axis sort (no T)", rsort, (rec, tail)),
        ("payload flatten slices", flatten, (payload,)),
        ("compact tile gather", gather, (payload, nbits)),
    ]:
        comp, t = bench(fn, *args)
        print(f"{name:26s} compile {comp:6.1f}s  best {t*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
