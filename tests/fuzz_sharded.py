#!/usr/bin/env python
"""Randomized differential fuzz of the sharded (multi-device) encoder.

The production ShardedGrayscaleEncoder runs the flagship slim pipeline
under shard_map over a ('data', 'seg') mesh (parallel/sharded.py); this
lane fuzzes it on a virtual CPU mesh against the host reference path:
for every image of every batch, the assembled stream must be byte-equal
to models.grayscale.compress at every quota class.

A fixed set of (geometry, mesh, dtype) combos is compiled once (warmup
excluded from the duration clock, like tests/fuzz_jax.py); content,
quota and batch vary per trial.

Run directly: ``python tests/fuzz_sharded.py [duration_s] [seed]``.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main(duration=300, seed=None):
    from icer_compression_tpu.parallel.sharded import (
        ShardedGrayscaleEncoder, make_mesh)
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import (
        CodecConfig, allocate_from_table, assemble_stream)
    from icer_compression_tpu.core.packets import (
        build_packets_grayscale, rearrange_order_grayscale, sort_packets)

    rng = np.random.default_rng(seed)
    combos = [
        # (W, H, stages, segments, mag_bits, mesh_data)
        (24, 24, 1, 2, 15, 2),
        (33, 27, 2, 3, 15, 4),
        (40, 40, 2, 4, 7, 2),
        (29, 37, 3, 2, 15, 2),
    ]
    encs = []
    for (W, H, st, g, mb, nd) in combos:
        mesh = make_mesh(nd, platform="cpu")
        encs.append((ShardedGrayscaleEncoder(mesh, W, H, st, 0, g,
                                             mag_bits=mb),
                     (W, H, st, g, mb, nd, mesh)))

    # warmup (compiles) excluded from the clock
    def content(B, H, W, mb):
        # uint8 headroom: the 8-bit DWT wraps on large-amplitude content
        # (icer_wavelet.c:243) -- keep u8 samples small, as the
        # reference-defined envelope does (see tests/fuzz_color_oracle.py)
        dt = np.uint16 if mb == 15 else np.uint8
        top = 200 if mb == 15 else 100
        base = int(rng.integers(0, 50))
        return ((np.add.outer(np.arange(H) * 3, np.arange(W))[None]
                 + base) % top
                + rng.integers(0, 26, (B, H, W))).astype(dt)

    for enc, (W, H, st, g, mb, nd, mesh) in encs:
        B = max(mesh.shape["data"], 1)
        enc.encode_batch(content(B, H, W, mb))

    bitplanes = {7: 7, 15: 9}
    t0 = time.time()
    trials = bad = 0
    while time.time() - t0 < duration:
        enc, (W, H, st, g, mb, nd, mesh) = encs[trials % len(encs)]
        B = max(mesh.shape["data"], 1) * int(rng.integers(1, 3))
        imgs = content(B, H, W, mb)
        qf = float(rng.choice([0.2, 0.7, 2.0]))
        quota = max(256, int(H * W * (1 if mb == 7 else 2) * qf))
        trials += 1
        cfg = CodecConfig(stages=st, filt=0, segments=g, byte_quota=quota)
        try:
            ll_means, tables = enc.encode_batch(imgs)
        except Exception as e:
            # overflow parity: the 8-bit DWT legitimately wraps on some
            # content (icer_wavelet.c:243) -- a sharded raise is correct
            # iff the host path raises on some image of the batch too
            host_raises = False
            for bi in range(B):
                try:
                    G.compress(imgs[bi], cfg)
                except Exception:
                    host_raises = True
                    break
            if host_raises:
                continue
            bad += 1
            print("SHARDED ENC RAISES (host does not)",
                  (W, H, st, g, mb, B, qf), e)
            continue
        bp = bitplanes[mb]
        for bi in range(B):
            ref = G.compress(imgs[bi], cfg)
            table = {(0,) + k: v for k, v in tables[bi].items()}
            packets = sort_packets(build_packets_grayscale(
                W, H, st, int(ll_means[bi]), bp))
            nsegs = {(p.decomp_level, p.subband_type): g for p in packets}
            encoded = allocate_from_table(packets, table, quota, nsegs,
                                          W, H)
            ours = assemble_stream(encoded, rearrange_order_grayscale(bp))
            if ours != ref:
                bad += 1
                print("SHARDED STREAM MISMATCH",
                      (W, H, st, g, mb, B, qf, bi))
                break
    print(f"sharded fuzz: {trials} trials, {bad} failures")
    return 1 if bad else 0


if __name__ == "__main__":
    dur = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else None
    sys.exit(main(dur, seed))
