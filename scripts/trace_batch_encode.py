#!/usr/bin/env python
"""Capture a jax.profiler trace of ONE steady-state batched fused encode
(B=21) and print the per-op self-time table (top N) -- the profiler's
absolute times are regime-hostage (PERF_NOTES), but the RELATIVE per-op
ranking within one capture is the attribution tool for the ~130 ms/batch
of encode device time the wall-A/B variants could not isolate.

Usage: python scripts/trace_batch_encode.py [B] [top]
"""

import shutil
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from icer_compression_tpu.ops.encode_jax import (JaxGrayscaleEncoder,
                                                     _ensure_cache)
    _ensure_cache()
    img = np.asarray(Image.open("tests/data/boat.512.png").convert("L"))
    up = jnp.asarray(np.broadcast_to(img, (B,) + img.shape
                                     ).astype(np.uint8))
    enc = JaxGrayscaleEncoder(512, 512, 4, 0, 6, 7, entropy="slim",
                              batch=B)
    np.asarray(enc._fused(up))          # compile + warm
    np.asarray(enc._fused(up))

    tdir = "/tmp/icer_trace_b21"
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        np.asarray(enc._fused(up))

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from trace_encode import parse_xplanes
    planes = parse_xplanes(tdir)
    for pname, rows in planes.items():
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        tot = sum(us for _n, us, _c in rows)
        print(f"\n== plane {pname}: total {tot/1e3:.1f} ms ==")
        for name, us, n in rows[:top]:
            print(f"  {us/1e3:9.2f} ms  x{n:<6d} {name[:110]}")
    if not planes:
        print("no xplanes captured")


if __name__ == "__main__":
    main()
