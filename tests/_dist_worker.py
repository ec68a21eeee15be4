"""Worker for the 2-process jax.distributed smoke (test_distributed.py).

Each process: initialize the distributed runtime (CPU backend, one local
device), build the global ('data', 'seg') mesh spanning both processes,
encode a sharded batch, and assert byte-exactness vs the host encoder.
Run: python _dist_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# jax.config, not the env var: a sitecustomize pre-imports jax with
# JAX_PLATFORMS=axon, so only a config update can pin the CPU backend.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from icer_compression_tpu.parallel import distributed  # noqa: E402

assert distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc, process_id=pid)

import jax  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc, jax.devices()

from icer_compression_tpu.core.packets import (  # noqa: E402
    build_packets_grayscale, rearrange_order_grayscale, sort_packets)
from icer_compression_tpu.models import grayscale as G  # noqa: E402
from icer_compression_tpu.models.grayscale import (  # noqa: E402
    CodecConfig, allocate_from_table, assemble_stream)
from icer_compression_tpu.parallel.sharded import (  # noqa: E402
    ShardedGrayscaleEncoder)

mesh = distributed.global_mesh(data=nproc)
assert mesh.shape["data"] == nproc and mesh.shape["seg"] == 1

H = W = 24
stages, segments = 1, 2
rng = np.random.default_rng(7)   # same seed every process: replicated input
imgs = ((np.add.outer(np.arange(H) * 3, np.arange(W))[None] % 150)
        + rng.integers(0, 40, (nproc, H, W))).astype(np.uint16)

enc = ShardedGrayscaleEncoder(mesh, W, H, stages, 0, segments, mag_bits=15)
ll_means, tables = enc.encode_batch(imgs)

cfg = CodecConfig(stages=stages, filt=0, segments=segments,
                  byte_quota=H * W * 2)
for bi in range(nproc):
    ref = G.compress(imgs[bi], cfg)
    table = {(0,) + k: v for k, v in tables[bi].items()}
    packets = sort_packets(build_packets_grayscale(
        W, H, stages, int(ll_means[bi]), 9))
    nsegs = {(p.decomp_level, p.subband_type): segments for p in packets}
    encoded = allocate_from_table(packets, table, H * W * 2, nsegs, W, H)
    assert assemble_stream(encoded, rearrange_order_grayscale(9)) == ref, \
        f"stream mismatch for image {bi} on process {pid}"

print(f"SMOKE-OK {pid}", flush=True)
