#!/usr/bin/env python
"""On-chip A/B: row-at-a-time vs tile-granular pallas coder kernels.

Measures wall time of the full kernel (L sequential steps x 128 lanes)
with forced materialization (np.asarray of a checksum fetch -- NOTE
block_until_ready is a no-op on this backend, see PERF_NOTES.md).

Usage: python scripts/bench_pallas_tile.py [L] [--tiled-only]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    L = int(args[0]) if args else 16384
    tiled_only = "--tiled-only" in sys.argv

    import jax
    import jax.numpy as jnp
    from icer_compression_tpu.ops import pallas_entropy as PE
    from icer_compression_tpu.ops.encode_jax import _ensure_cache
    _ensure_cache()

    rng = np.random.default_rng(0)
    ctx = rng.integers(0, 18, (L, PE.LANES)).astype(np.int32)
    bit = rng.integers(0, 2, (L, PE.LANES)).astype(np.int32)
    valid = (rng.random((L, PE.LANES)) < 0.9).astype(np.int32)
    jv, jc, jb = map(jnp.asarray, (valid, ctx, bit))

    def measure(name, factory, **kw):
        run = factory(L, chunk=2048, **kw)

        @jax.jit
        def summed(v, c, b):
            code, nbits, opn = run(v, c, b)
            return code.sum() + nbits.sum() + (opn % 97).sum()

        t0 = time.time()
        chk = np.asarray(summed(jv, jc, jb))
        print(f"{name}: first call (compile+run) {time.time() - t0:.1f} s, "
              f"checksum {int(chk)}")
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(summed(jv, jc, jb))
            ts.append(time.time() - t0)
        best = min(ts)
        print(f"{name}: best of 3 = {best*1e3:.0f} ms "
              f"({best/L*1e6:.2f} us/step)")
        return int(chk)

    c2 = measure("tiled(8)", PE.make_encode_lanes_pallas_tiled, tile=8)
    if not tiled_only:
        c1 = measure("row-at-a-time", PE.make_encode_lanes_pallas)
        print("checksums match:", c1 == c2)


if __name__ == "__main__":
    main()
