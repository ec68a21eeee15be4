#!/usr/bin/env python
"""Structural scaling evidence for the sharded encoder (SCALING.md).

Two measurements:
 1. On the real chip (1-device mesh -- the only real TPU available):
    steady-state wall of the sharded shard_map program vs the fused
    single-chip encoder at the same (B, 512^2) shapes.  The sharded
    program IS the fused pipeline under shard_map; its single-device
    overhead bounds the per-shard inefficiency that multi-chip scaling
    would add on top of the collective bytes.
 2. On virtual CPU meshes (N = 2, 4, 8): the compiled HLO's collective
    traffic -- every all-gather/reduce byte the program moves per image.
    The codec's only collective is the ordered gather of per-lane
    payload buffers + lengths, KB-scale per image; compute per shard is
    MB-scale, so the model predicts >= 90% scaling once per-chip batch
    is held constant (weak scaling).

Usage: python scripts/probe_sharded_chip.py [chip|virtual] [B]
"""

import re
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def best(fn, reps=4):
    t0 = time.time()
    fn()
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return comp, min(ts)


def load_batch(B):
    from PIL import Image
    img = np.asarray(Image.open("tests/data/boat.512.png").convert("L"))
    return np.broadcast_to(img, (B,) + img.shape).astype(np.uint16).copy()


def chip(B=21):
    from icer_compression_tpu.ops.encode_jax import (JaxGrayscaleEncoder,
                                                     _ensure_cache)
    from icer_compression_tpu.parallel.sharded import (
        ShardedGrayscaleEncoder, make_mesh)
    _ensure_cache()
    imgs = load_batch(B)
    h, w = imgs.shape[1:]

    mesh = make_mesh(1)
    senc = ShardedGrayscaleEncoder(mesh, w, h, 4, 0, 6, mag_bits=15)
    enc = JaxGrayscaleEncoder(w, h, 4, 0, 6, 15, entropy="slim", batch=B)
    t0 = time.time()
    senc.encode_batch(imgs)
    comp_s = time.time() - t0
    t0 = time.time()
    enc.encode_batch(imgs)
    comp_f = time.time() - t0
    # INTERLEAVED best-of-N: the tunnel regime swings tens of percent
    # between runs, so alternating samples is the only trustworthy way
    # to take the sharded/fused ratio
    t_sh = t_f = float("inf")
    for _ in range(6):
        t0 = time.time()
        senc.encode_batch(imgs)
        t_sh = min(t_sh, time.time() - t0)
        t0 = time.time()
        enc.encode_batch(imgs)
        t_f = min(t_f, time.time() - t0)
    print(f"sharded 1-dev mesh: compile {comp_s:.1f}s  "
          f"best {t_sh*1e3:.1f} ms/batch ({t_sh*1e3/B:.2f} ms/img)",
          flush=True)
    print(f"fused single-chip:  compile {comp_f:.1f}s  "
          f"best {t_f*1e3:.1f} ms/batch ({t_f*1e3/B:.2f} ms/img)",
          flush=True)
    print(f"sharded/fused wall ratio (interleaved): {t_sh/t_f:.3f}",
          flush=True)


def virtual(B=8):
    import jax
    from icer_compression_tpu.parallel.sharded import (
        ShardedGrayscaleEncoder, make_mesh)
    imgs = load_batch(B)
    h, w = imgs.shape[1:]
    for nd in (2, 4, 8):
        mesh = make_mesh(nd, platform="cpu")
        senc = ShardedGrayscaleEncoder(mesh, w, h, 4, 0, 6, mag_bits=15)
        # compile the step and mine the optimized HLO for collectives
        dev_images = jax.device_put(
            imgs, senc._NamedSharding(mesh, senc._P("data", None, None)))
        compiled = senc._step_compact.lower(dev_images).compile()
        txt = compiled.as_text()
        coll_bytes = 0
        n_coll = 0
        for m in re.finditer(
                r"(all-gather|all-reduce|reduce-scatter|collective-permute"
                r")[^=]*= *\(?([a-z0-9]+)\[([0-9,]*)\]", txt):
            dt, dims = m.group(2), m.group(3)
            size = int(np.prod([int(d) for d in dims.split(",") if d]))
            width = int(re.search(r"(\d+)", dt).group(1)) // 8 \
                if re.search(r"(\d+)", dt) else 4
            coll_bytes += size * width
            n_coll += 1
        print(f"mesh {mesh.shape}: {n_coll} collectives, "
              f"{coll_bytes/1e3:.1f} KB result bytes per step "
              f"({coll_bytes/1e3/B:.1f} KB/img)", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "chip"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else (21 if mode == "chip"
                                                    else 8)
    if mode == "chip":
        chip(B)
    else:
        virtual(B)
