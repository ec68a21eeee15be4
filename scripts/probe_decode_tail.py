#!/usr/bin/env python
"""On-chip cost probe for the fused decode program's non-kernel stages.

The B=14 trace shows ~150 ms of big fusions (8 x 17-20 ms) besides the
plane kernels; candidates are (a) the per-round window gathers, (b) the
per-(unit,lane) canvas placement DUS chain, (c) the vmapped inverse DWT.
Times each in isolation at the B=14 512x512 geometry.
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
    from icer_compression_tpu.ops import wavelet as W

    B, h, w = 14, 512, 512
    rng = np.random.default_rng(0)
    mag_bits = 15

    # (c) inverse DWT over the batch
    img = rng.integers(0, 1 << 15, (B, h, w)).astype(np.int32)
    imgj = jnp.asarray(img)

    @jax.jit
    def inv(x):
        y = jax.vmap(lambda z: W.inverse_stages(z, 4, 0, mag_bits,
                                                jnp)[0])(x)
        return jnp.maximum(y, 0).sum()

    comp, best = bench(inv, imgj)
    print(f"inverse DWT x{B}: compile {comp:.1f}s best {best*1e3:.1f} ms",
          flush=True)

    # (c2) from_sign_magnitude + clamp alone
    @jax.jit
    def fsm(x):
        return W.from_sign_magnitude(x, mag_bits, jnp).sum()

    comp, best = bench(fsm, imgj)
    print(f"from_sign_magnitude x{B}: compile {comp:.1f}s "
          f"best {best*1e3:.1f} ms", flush=True)

    # dispatch/transfer wall floor for these probes
    tiny = jnp.zeros((8,), jnp.int32)

    @jax.jit
    def nop(x):
        return x.sum()

    comp, best = bench(nop, tiny)
    print(f"dispatch floor: best {best*1e3:.1f} ms", flush=True)

    # (b) canvas placement: 78 subband-segment slabs per image
    # mirror _run_fused: units hold (PX, lanes) outputs, transpose, then
    # per-placement reshape+slice+DUS into the (B, h, w) canvas
    from icer_compression_tpu.models.decode_jax import _plan_lanes
    from icer_compression_tpu.models.grayscale import CodecConfig

    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=h * w)
    lane_buckets = _plan_lanes(w, h, cfg)
    lanes = [ln for b_ in lane_buckets for ln in b_]
    Hm = max(x["h"] for x in lanes)
    Wp = -(-max(x["w"] for x in lanes) // 8) * 8
    PX = Hm * Wp
    nl = len(lanes) * B
    m = -(-nl // 128) * 128
    out = jnp.asarray(rng.integers(0, 1 << 16, (PX, m)).astype(np.int32))
    placements = []
    i = 0
    for b in range(B):
        for ln in lanes:
            placements.append((i, b, ln["row"], ln["col"], ln["h"],
                               ln["w"]))
            i += 1

    @jax.jit
    def place(o):
        canvas = jnp.zeros((B, h, w), jnp.int32)
        oT = o.T
        for (lane, b, row, col, hgt, wid) in placements:
            simg = oT[lane].reshape(Hm, Wp)[:hgt, :wid]
            canvas = canvas.at[b, row:row + hgt, col:col + wid].set(simg)
        return canvas.sum()

    comp, best = bench(place, out)
    print(f"canvas placement ({len(placements)} slabs, one unit): "
          f"compile {comp:.1f}s best {best*1e3:.1f} ms", flush=True)

    # (a) window gathers: 9 rounds x NWr rows x m lanes from padded words
    swords = jnp.asarray(rng.integers(0, 1 << 30,
                                      (48 * 1024,)).astype(np.int32))
    offs = jnp.asarray(rng.integers(0, 160 * 1024,
                                    (9, m)).astype(np.int32))
    NWr = [8, 8, 16, 32, 64, 128, 256, 512, 1024]
    NW = 1024

    @jax.jit
    def windows(swords, offs):
        limit = swords.shape[0] - 1
        parts = []
        for r in range(9):
            j = jnp.arange(NWr[r], dtype=jnp.int32)[:, None]
            idx = (offs[r] >> 2)[None, :] + j
            wr = swords[jnp.clip(idx, 0, limit)]
            if NWr[r] < NW:
                wr = jnp.pad(wr, ((0, NW - NWr[r]), (0, 0)))
            parts.append(wr)
        return jnp.concatenate(parts).sum()

    comp, best = bench(windows, swords, offs)
    print(f"window gathers (R=9, m={m}): compile {comp:.1f}s "
          f"best {best*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
