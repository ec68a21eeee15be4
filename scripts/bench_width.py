#!/usr/bin/env python
"""On-chip lane-width scaling of the pallas coder kernel.

Hypothesis: at 128 lanes (one native vreg per row) the per-step chain is
ALU-latency-bound; wider rows (256/512) give the VPU independent vregs per
vector op, hiding latency -- more lanes per step at ~constant step time.

Usage: python scripts/bench_width.py [L] [widths...]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    args = [int(a) for a in sys.argv[1:]]
    L = args[0] if args else 8192
    widths = args[1:] or [128, 256, 512]

    import jax
    import jax.numpy as jnp
    from icer_compression_tpu.ops import pallas_entropy as PE
    from icer_compression_tpu.ops.encode_jax import _ensure_cache
    _ensure_cache()

    rng = np.random.default_rng(0)
    for lanes in widths:
        chunk = max(256, min(2048, (1 << 20) // lanes // 4 * 4))
        chunk = 1 << (chunk.bit_length() - 1)
        ctx = rng.integers(0, 18, (L, lanes)).astype(np.int32)
        bit = rng.integers(0, 2, (L, lanes)).astype(np.int32)
        valid = (rng.random((L, lanes)) < 0.9).astype(np.int32)
        jv, jc, jb = map(jnp.asarray, (valid, ctx, bit))

        run = PE.make_encode_lanes_pallas(L, chunk=chunk, lanes=lanes)

        @jax.jit
        def summed(v, c, b, run=run):
            code, nbits, opn = run(v, c, b)
            return code.sum() + nbits.sum() + (opn % 97).sum()

        t0 = time.time()
        chk = np.asarray(summed(jv, jc, jb))
        print(f"lanes={lanes} chunk={chunk}: compile+run "
              f"{time.time() - t0:.1f} s, checksum {int(chk)}", flush=True)
        ts = []
        for _ in range(4):
            t0 = time.time()
            np.asarray(summed(jv, jc, jb))
            ts.append(time.time() - t0)
        best = min(ts)
        print(f"lanes={lanes}: best {best*1e3:.0f} ms = "
              f"{best/L*1e6:.2f} us/step = "
              f"{best/L/(lanes/128)*1e6:.3f} us/step/128lanes", flush=True)


if __name__ == "__main__":
    main()
