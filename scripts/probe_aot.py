#!/usr/bin/env python
"""AOT executable serialization probe (VERDICT r3 #5).

Can a serving process load compiled TPU executables from disk instead
of paying the ~15 s/program persistent-cache-hit floor through the
remote compiler?  Stage 1 compiles the batched fused encode program,
serializes it with jax.experimental.serialize_executable, and writes it
to /tmp.  Stage 2 (run with 'load' in a FRESH process) deserializes and
executes, timing every step.

Usage: python scripts/probe_aot.py save|load [B]
"""

import pickle
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

PATH = "/tmp/icer_aot_exec.pkl"


def build(B):
    import jax.numpy as jnp
    from PIL import Image
    from icer_compression_tpu.ops.encode_jax import (JaxGrayscaleEncoder,
                                                     _ensure_cache)
    _ensure_cache()
    img = np.asarray(Image.open("tests/data/boat.512.png").convert("L"))
    up = np.broadcast_to(img, (B,) + img.shape).astype(np.uint8)
    enc = JaxGrayscaleEncoder(512, 512, 4, 0, 6, 7, entropy="slim",
                              batch=B)
    return enc, jnp.asarray(up)


def save(B):
    from jax.experimental import serialize_executable as se
    t0 = time.time()
    enc, up = build(B)
    print(f"encoder built {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    fused = getattr(enc._fused, '_jitted', enc._fused)
    lowered = fused.lower(up)
    print(f"lowered {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    comp = lowered.compile()
    print(f"compiled {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    blob = se.serialize(comp)
    with open(PATH, "wb") as f:
        pickle.dump(blob, f)
    import os
    print(f"serialized {time.time()-t0:.1f}s, "
          f"{os.path.getsize(PATH)/1e6:.1f} MB", flush=True)
    t0 = time.time()
    out = np.asarray(comp(up))
    print(f"exec ok {time.time()-t0:.1f}s, out words {out.shape}",
          flush=True)


def load(B):
    t0 = time.time()
    from jax.experimental import serialize_executable as se
    enc, up = build(B)     # traces nothing; just arrays + planner
    print(f"setup {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    with open(PATH, "rb") as f:
        blob = pickle.load(f)
    comp = se.deserialize_and_load(*blob)
    print(f"deserialize_and_load {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = np.asarray(comp(up))
    print(f"first exec {time.time()-t0:.1f}s, out words {out.shape}",
          flush=True)
    t0 = time.time()
    out = np.asarray(comp(up))
    print(f"second exec {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    (save if mode == "save" else load)(B)
