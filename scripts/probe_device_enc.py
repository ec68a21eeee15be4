#!/usr/bin/env python
"""Encode-only device-time batch sweep (interleaved floor A/B).

Usage: python scripts/probe_device_enc.py [B ...]  (default: 56 112 168)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    batches = [int(a) for a in sys.argv[1:]] or [56, 112, 168]
    reps = 5

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from icer_compression_tpu.ops.encode_jax import (JaxGrayscaleEncoder,
                                                     _ensure_cache)
    _ensure_cache()

    img = np.asarray(Image.open("tests/data/boat.512.png")
                     .convert("L")).astype(np.uint16)
    h, w = img.shape
    rng = np.random.default_rng(0)

    for B in batches:
        imgs = np.stack([
            np.clip(img.astype(np.int32) + rng.integers(-6, 7, img.shape),
                    0, 255).astype(np.uint16) for _ in range(B)])
        imgs[0] = img
        enc = JaxGrayscaleEncoder(w, h, 4, 0, 6, 15, batch=B,
                                  entropy="slim")
        up8 = imgs.astype(np.uint8)
        t0 = time.time()
        full_n = int(enc._fused(jnp.asarray(up8)).shape[0])
        warm = time.time() - t0

        @jax.jit
        def _floor(x, full_n=full_n):
            return jnp.zeros((full_n,), jnp.int32).at[0].set(
                x.astype(jnp.int32).sum())

        np.asarray(_floor(up8))
        mins = [float("inf")] * 2
        for _ in range(reps):
            for i, fn in enumerate([
                    lambda: np.asarray(_floor(up8)),
                    lambda: np.asarray(enc._fused(jnp.asarray(up8)))]):
                t0 = time.perf_counter()
                fn()
                mins[i] = min(mins[i], time.perf_counter() - t0)
        fe, we = mins
        enc_ms = max(0.0, we - fe) * 1e3 / B
        print(f"B={B}: encode device {enc_ms:.2f} ms/img "
              f"(floor {fe*1e3:.0f} wall {we*1e3:.0f} ms; warm {warm:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
