#!/usr/bin/env python
"""Segment-throughput scaling harness (sharded encoder over a device mesh).

Runs the shard_map batch encoder over meshes of 1..N devices and reports
per-configuration throughput.  On real multi-chip hardware this measures
ICI scaling of the ('data', 'seg') layout; in this single-chip environment
it can only be exercised with virtual CPU devices (pass --platform cpu),
which demonstrates the harness and the program but measures host
emulation, not interconnect scaling.

Usage: python bench_scaling.py [--devices 1,2,4,8] [--platform cpu]
       [--size 128] [--batch-per-device 2]

Each mesh shape requires a (cached) compile; with this environment's
remote compile service a cold run takes minutes per shape.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--stages", type=int, default=2)
    ap.add_argument("--batch-per-device", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    counts = [int(x) for x in args.devices.split(",")]
    import os
    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{max(counts)}").strip()

    from icer_compression_tpu.parallel.sharded import (
        ShardedGrayscaleEncoder, make_mesh)

    H = W = args.size
    rng = np.random.default_rng(0)
    results = []
    base = None
    for n in counts:
        mesh = make_mesh(n, platform=args.platform or None)
        enc = ShardedGrayscaleEncoder(mesh, W, H, args.stages, 0,
                                      args.segments, mag_bits=15)
        B = mesh.shape["data"] * args.batch_per_device
        imgs = ((np.add.outer(np.arange(H) * 3, np.arange(W))[None] % 200)
                + rng.integers(0, 40, (B, H, W))).astype(np.uint16)
        enc.encode_batch(imgs)          # warmup/compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            enc.encode_batch(imgs)
        dt = (time.perf_counter() - t0) / args.reps
        mps = B * H * W / dt / 1e6
        eff = None
        if base is None:
            base = (n, mps)
        else:
            eff = round((mps / base[1]) / (n / base[0]), 3)
        results.append({"devices": n, "mesh": dict(mesh.shape),
                        "batch": B, "MPs": round(mps, 3),
                        "scaling_efficiency": eff})
        print(json.dumps(results[-1]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
