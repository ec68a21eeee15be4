#!/usr/bin/env python
"""On-chip probe: scalar vs row-tile gather cost for decode window assembly.

The fused decode program's window gathers (decode_jax.py:298) serialize
per scalar element (~3.6 ns/word).  Hypothesis: gathering ROWS of a
(S/TW, TW)-reshaped stream (one contiguous TW-word copy per index) costs
per-row, not per-element, making tile-aligned windows ~TW x cheaper.
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

    S = 1 << 20                   # 4 MB stream words
    m = 1152                      # lanes
    NW = 2048                     # window words per lane
    rng = np.random.default_rng(0)
    sw = jnp.asarray(rng.integers(0, 1 << 30, S).astype(np.int32))
    offs = jnp.asarray(rng.integers(0, S - NW * 2, m).astype(np.int32))

    @jax.jit
    def nop(x):
        return x.sum()

    _, floor = bench(nop, sw[:8])
    print(f"floor {floor*1e3:.1f} ms", flush=True)

    @jax.jit
    def scalar(sw, offs):
        j = jnp.arange(NW, dtype=jnp.int32)[:, None]
        idx = offs[None, :] + j                    # (NW, m)
        return sw[jnp.clip(idx, 0, S - 1)].sum()

    comp, best = bench(scalar, sw, offs)
    print(f"scalar gather (NW={NW}, m={m}, {NW*m/1e6:.1f}M words): "
          f"compile {comp:.1f}s best {(best-floor)*1e3:.1f} ms", flush=True)

    for TW in (8, 32, 128):
        swt = sw.reshape(S // TW, TW)
        nt = NW // TW + 1

        @jax.jit
        def tiled(swt, offs, TW=TW, nt=nt):
            t0 = offs // TW
            j = jnp.arange(nt, dtype=jnp.int32)[:, None]
            idx = t0[None, :] + j                  # (nt, m)
            rows = swt[jnp.clip(idx, 0, S // TW - 1)]   # (nt, m, TW)
            return rows.sum()

        comp, best = bench(tiled, swt, offs)
        print(f"tile gather TW={TW} ({nt}x{m} rows, "
              f"{nt*m*TW/1e6:.1f}M words): compile {comp:.1f}s "
              f"best {(best-floor)*1e3:.1f} ms", flush=True)

    # the layout the kernel wants: (NW', m) with the tile dim unpacked --
    # measure the transpose/reshape to (nt*TW, m) too
    TW = 128
    swt = sw.reshape(S // TW, TW)
    nt = NW // TW + 1

    @jax.jit
    def tiled_t(swt, offs):
        t0 = offs // TW
        j = jnp.arange(nt, dtype=jnp.int32)[:, None]
        idx = t0[None, :] + j
        rows = swt[jnp.clip(idx, 0, S // TW - 1)]   # (nt, m, TW)
        win = rows.transpose(0, 2, 1).reshape(nt * TW, m)
        return win.sum()

    comp, best = bench(tiled_t, swt, offs)
    print(f"tile gather + transpose to (NW', m): compile {comp:.1f}s "
          f"best {(best-floor)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
