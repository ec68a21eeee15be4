#!/usr/bin/env python
"""On-chip benchmark of the slim pallas coder kernel across lane widths.

Measures us/step (forced materialization via checksum fetch) and verifies
the checksum is width-invariant for the shared first 128 lanes.

Usage: python scripts/bench_slim.py [L] [widths...]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    args = [int(a) for a in sys.argv[1:]]
    L = args[0] if args else 8192
    widths = args[1:] or [128, 256, 512, 1024]

    import jax
    import jax.numpy as jnp
    from icer_compression_tpu.ops import pallas_entropy as PE
    from icer_compression_tpu.ops.encode_jax import _ensure_cache
    _ensure_cache()

    rng = np.random.default_rng(0)
    ctx = rng.integers(0, 18, (L, max(widths))).astype(np.int32)
    bit = rng.integers(0, 2, (L, max(widths))).astype(np.int32)
    valid = (rng.random((L, max(widths))) < 0.9).astype(np.int32)
    packed_all = PE.pack_emissions(valid, ctx, bit, np)

    for lanes in widths:
        # slim kernel: 3 chunk-sized buffers; keep blocks ~<= 4 MB total
        chunk = max(256, min(2048, (1 << 21) // (lanes * 4 * 3)))
        chunk = 1 << (chunk.bit_length() - 1)
        if L % chunk:
            chunk = 256
        packed = jnp.asarray(packed_all[:, :lanes])
        run = PE.make_encode_lanes_slim(L, chunk=chunk, lanes=lanes)

        @jax.jit
        def summed(p, run=run):
            outs = run(p)
            rec, fs, mo = outs[0], outs[-3], outs[-2]
            return ((rec % 97).sum() + fs.sum() + mo.sum(),
                    (rec[:, :128] % 97).sum())

        t0 = time.time()
        chk, chk128 = (np.asarray(x) for x in summed(packed))
        print(f"lanes={lanes} chunk={chunk}: compile+run "
              f"{time.time() - t0:.1f} s, checksum {int(chk)} "
              f"first128 {int(chk128)}", flush=True)
        ts = []
        for _ in range(4):
            t0 = time.time()
            np.asarray(summed(packed)[0])
            ts.append(time.time() - t0)
        best = min(ts)
        print(f"lanes={lanes}: best {best*1e3:.0f} ms = "
              f"{best/L*1e6:.2f} us/step = "
              f"{best/L/(lanes/128)*1e6:.3f} us/step/128lanes", flush=True)


if __name__ == "__main__":
    main()
