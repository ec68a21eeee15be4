#!/usr/bin/env python
"""In-process wall A/B decomposition of the fused batched encoder.

Every variant runs the SAME upload (B images) and fetches the SAME
output size (the full program's padded blob length), so steady-state
wall DIFFERENCES between variants are pure device-cost deltas -- immune
to the server-side per-module profile cache that makes jax.profiler
numbers regime-hostage (PERF_NOTES.md round-3).

Variants (cumulative pipeline prefixes):
  full      transform + emissions + slim kernel + sort + decode + pack
  sortonly  ... + slim kernel + ordering sort (skip decode+pack)
  notail    ... + slim kernel                 (skip sort+decode+pack)
  nokernel  transform + emissions             (skip kernel + tail)

Usage: python scripts/probe_encode_ablate.py [B] [side]
"""

import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def bench(fn, *args, reps=6):
    t0 = time.time()
    np.asarray(fn(*args))
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return comp, min(ts)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from icer_compression_tpu.ops import pallas_entropy as PE
    from icer_compression_tpu.ops import encode_jax as EJ
    from icer_compression_tpu.ops.encode_jax import (JaxGrayscaleEncoder,
                                                     _ensure_cache)
    _ensure_cache()

    img = np.asarray(Image.open("tests/data/boat.512.png").convert("L"))
    img = img[:side, :side]
    imgs = np.broadcast_to(img, (B,) + img.shape).copy()
    # uint8 upload as the serving path would
    up = jnp.asarray(imgs.astype(np.uint8))

    def make(variant):
        """Build the fused program with the tail/kernel stage patched."""
        orig_pack = PE.order_and_pack_lane_packed
        orig_kern = PE.make_encode_lanes_slim
        orig_operand = PE.slim_sort_operand_packed

        def pack_checksum(ops, xp, max_bits=None, slice_to=None,
                          return_words=False):
            # scatter-free stub: a pad, not a vmapped at[0].set (the
            # latter measured tens of ms vmapped over 3402 lanes)
            pw = max_bits // 32
            payload = xp.pad(ops[:1] & 0xFF, (0, pw - 1))
            return payload, (ops[0] & 1023) + 32, ops[0] < -2

        def pack_sortonly(ops, xp, max_bits=None, slice_to=None,
                          return_words=False):
            s = xp.sort(ops, axis=-1, stable=False)
            if slice_to is not None and slice_to < s.shape[-1]:
                s = s[:slice_to]
            pw = max_bits // 32
            payload = xp.pad(s[:1] & 0xFF, (0, pw - 1))
            return payload, (s[0] & 1023) + 32, s[0] < -2

        def pack_const(ops, xp, max_bits=None, slice_to=None,
                       return_words=False):
            # constant result: lets XLA DCE the sort-operand build +
            # transpose entirely (kernel stays alive through misc)
            pw = max_bits // 32
            return (xp.zeros((pw,), xp.int32), xp.zeros((), xp.int32) + 32,
                    xp.zeros((), bool))

        def operand_norec(rec, fstate, ev, xp):
            return rec      # skip the tail/ev concat

        def kern_stub(L, chunk=512, interpret=False, lanes=128,
                      fused_key=None):
            def run(packed):
                z = jnp.broadcast_to(
                    packed.sum() & 0, (L, lanes)) + PE.BIGPK
                fstate = jnp.zeros((17, lanes), jnp.int32)
                misc = jnp.zeros((8, lanes), jnp.int32)
                ev = jnp.full((PE._NEV, lanes), PE.BIGPK, jnp.int32)
                return z, fstate, misc, ev
            run.fused_key = True
            return run

        @contextmanager
        def patched():
            try:
                if variant in ("notail", "nokernel", "noconcat"):
                    PE.order_and_pack_lane_packed = pack_checksum
                elif variant == "sortonly":
                    PE.order_and_pack_lane_packed = pack_sortonly
                elif variant == "fakepost":
                    PE.order_and_pack_lane_packed = pack_const
                if variant == "noconcat":
                    PE.slim_sort_operand_packed = operand_norec
                if variant == "nokernel":
                    PE.make_encode_lanes_slim = kern_stub
                yield
            finally:
                PE.order_and_pack_lane_packed = orig_pack
                PE.make_encode_lanes_slim = orig_kern
                PE.slim_sort_operand_packed = orig_operand

        with patched():
            enc = JaxGrayscaleEncoder(side, side, 4, 0, 6, 7, entropy="slim",
                                      batch=B)
            fn = enc._fused
        return enc, fn

    # full program first: records the real output length
    enc, f_full = make("full")
    out = f_full(up)
    FULLN = out.shape[0]
    print(f"B={B} side={side} full output words = {FULLN}", flush=True)

    results = {}

    def timed(name, fn):
        fn = getattr(fn, "_jitted", fn)   # unwrap the AOT-cache layer:
        # tracing through a loaded PJRT executable raises on accelerators
        g = jax.jit(lambda x: jnp.zeros((FULLN,), jnp.int32).at[0].set(
            fn(x).sum()) if name != "full" else fn(x))
        comp, t = bench(g, up)
        results[name] = t
        print(f"{name:10s} compile {comp:6.1f}s  best {t*1e3:8.1f} ms "
              f"({t*1e3/B:6.2f} ms/img)", flush=True)

    if os.environ.get("ICER_ABLATE_FULL", "1") != "0":
        timed("full", f_full)
    variants = os.environ.get(
        "ICER_ABLATE_VARIANTS", "sortonly,notail,nokernel").split(",")
    for v in variants:
        _, fv = make(v)
        timed(v, fv)

    print("\n--- walls (ms/batch) ---")  # noqa
    for k, v in results.items():
        print(f"{k:12s} {v*1e3:8.1f}", flush=True)




def floors(B=21, side=512, FULLN=1044800):
    """Transfer/dispatch floors: same-shape uploads/fetches, ~no compute."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from icer_compression_tpu.ops.encode_jax import _ensure_cache
    _ensure_cache()
    img = np.asarray(Image.open("tests/data/boat.512.png").convert("L"))
    up = jnp.asarray(np.broadcast_to(img[:side, :side],
                                     (B, side, side)).astype(np.uint8))
    small = jnp.zeros((8,), jnp.uint8)

    @jax.jit
    def floor_full(x):   # upload batch + fetch FULLN
        return jnp.zeros((FULLN,), jnp.int32).at[0].set(
            x.astype(jnp.int32).sum())

    @jax.jit
    def floor_up(x):     # upload batch + tiny fetch
        return x.astype(jnp.int32).sum()[None]

    @jax.jit
    def floor_down(s):   # tiny upload + fetch FULLN
        return jnp.zeros((FULLN,), jnp.int32).at[0].set(
            s.astype(jnp.int32).sum())

    @jax.jit
    def floor_disp(s):   # tiny both ways
        return s.astype(jnp.int32).sum()[None]

    for name, fn, arg in [("floor_full", floor_full, up),
                          ("floor_up", floor_up, up),
                          ("floor_down", floor_down, small),
                          ("floor_disp", floor_disp, small)]:
        comp, t = bench(fn, arg)
        print(f"{name:12s} compile {comp:5.1f}s  best {t*1e3:8.1f} ms",
              flush=True)




def stages(B=21, side=512):
    """Finer split of the pre-kernel pipeline: transform / emissions /
    interleave, same device-array input and FULLN output as main()."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from icer_compression_tpu.ops.encode_jax import (JaxGrayscaleEncoder,
                                                     _ensure_cache)
    _ensure_cache()
    img = np.asarray(Image.open("tests/data/boat.512.png").convert("L"))
    img = img[:side, :side]
    up = jnp.asarray(np.broadcast_to(img, (B,) + img.shape
                                     ).astype(np.uint8))
    enc = JaxGrayscaleEncoder(side, side, 4, 0, 6, 7, entropy="slim",
                              batch=B)
    FULLN = 1044800

    def wrap(body):
        @jax.jit
        def f(x):
            return jnp.zeros((FULLN,), jnp.int32).at[0].set(body(x))
        return f

    def transform_only(x):
        im, llm, ov = jax.vmap(enc._transform_fn)(x)
        return im.sum() + llm.sum() + ov.sum()

    emit_fns = [enc._make_emit_fn(g, cut) for g, cut in
                zip(enc.groups, enc.plane_cuts)]

    def emissions(x):
        im, llm, ov = jax.vmap(enc._transform_fn)(x)
        tot = jnp.zeros((), jnp.int32)
        for fn in emit_fns:
            w0, w1 = jax.vmap(fn)(im)
            tot = tot + w0.sum() + w1.sum()
        return tot + llm.sum()

    def interleave(x):
        im, llm, ov = jax.vmap(enc._transform_fn)(x)
        emitted = []
        for fn in emit_fns:
            w0, w1 = jax.vmap(fn)(im)
            emitted.append((w0.reshape(-1, w0.shape[-1]),
                            w1.reshape(-1, w1.shape[-1])))
        tot = jnp.zeros((), jnp.int32)
        for b in enc.buckets:
            parts = [emitted[gi] for gi in b["groups"]]
            Lb = b["L"]
            half = Lb // 2
            w0s, w1s = [], []
            for (w0, w1) in parts:
                pad = half - w0.shape[-1]
                w0s.append(jnp.pad(w0, ((0, 0), (0, pad))))
                w1s.append(jnp.pad(w1, ((0, 0), (0, pad))))
            w0 = jnp.concatenate(w0s, axis=0)
            w1 = jnp.concatenate(w1s, axis=0)
            packed = jnp.stack([w0, w1], axis=-1).reshape(w0.shape[0], Lb)
            tot = tot + packed.sum()
        return tot + llm.sum()

    for name, body in [("transform", transform_only),
                       ("emissions", emissions),
                       ("interleave", interleave)]:
        comp, t = bench(wrap(body), up)
        print(f"{name:10s} compile {comp:6.1f}s  best {t*1e3:8.1f} ms "
              f"({t*1e3/B:6.2f} ms/img)", flush=True)


if __name__ == "__main__":
    if "floors" in sys.argv:
        floors()
    elif "stages" in sys.argv:
        stages()
    else:
        main()
