#!/usr/bin/env python
"""Stage-by-stage cost attribution for the fused TPU encoder.

Builds cumulative-prefix jit programs of the encode pipeline (upload-only,
+transform, +emissions, +compaction, +kernel, +records/order/pack, full)
and times each with forced materialization (>=1 MB fetch, the honest-timing
requirement on tunnel-attached chips where block_until_ready is a no-op).
The difference between consecutive rows is that stage's device cost; the
first row is the transfer+dispatch floor.

Usage: python scripts/profile_encode.py [W H [batch]]   (default 512 512 1)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def bench(fn, arg, reps=5):
    t0 = time.time()
    np.asarray(fn(arg))
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(arg))
        ts.append(time.time() - t0)
    return compile_s, min(ts)


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder
    from icer_compression_tpu.ops import pallas_entropy as PE

    img = np.asarray(Image.open("/root/reference/boat.512.bmp")
                     .convert("L").resize((W, H))).astype(np.uint16)
    imgs = jnp.asarray(np.broadcast_to(img, (B, H, W)).copy())

    enc = JaxGrayscaleEncoder(W, H, 4, 0, 6, 15, entropy="slim", batch=B)
    PAD = 1 << 18  # 1 MiB of int32: fetch-size floor

    def padded(x):
        return jnp.zeros((PAD,), jnp.int32).at[0].set(
            x.astype(jnp.int32).reshape(-1)[0])

    def mk_stage(depth):
        emit_fns = [enc._make_emit_fn(g) for g in enc.groups]

        def fn(images):
            if depth == 0:
                return padded(images.sum())
            timg, ll, ov = jax.vmap(enc._transform_fn)(images)
            if depth == 1:
                return padded(timg.sum() + ll.sum())
            emitted = []
            for f in emit_fns:
                w0, w1 = jax.vmap(f)(timg)
                emitted.append((w0.reshape(-1, w0.shape[-1]),
                                w1.reshape(-1, w1.shape[-1])))
            if depth == 2:
                acc = sum((w0.sum() + w1.sum()) for (w0, w1) in emitted)
                return padded(acc)
            acc = jnp.int32(0)
            for bk in enc.buckets:
                parts = [emitted[gi] for gi in bk["groups"]]
                Lb = bk["L"]
                packed, over = enc._gather_compact_words(parts, Lb)
                if depth == 3:
                    acc += packed.sum()
                    continue
                chunk = 256
                Lc = min(-(-Lb // chunk) * chunk,
                         (-(-(3 * Lb) // 4) + 255) // 256 * 256)
                if Lc > packed.shape[-1]:
                    packed = jnp.pad(
                        packed, ((0, 0), (0, Lc - packed.shape[-1])))
                n = packed.shape[0]
                import os
                width = int(os.environ.get("ICER_PALLAS_WIDTH", "0")) \
                    or min(2048, 512 * B)
                lanes = min(width, -(-n // PE.LANES) * PE.LANES)
                run = PE.make_encode_lanes_slim(Lc, chunk=chunk, lanes=lanes)
                nblk = -(-n // lanes)
                rpad = nblk * lanes - n
                packed = jnp.pad(packed, ((0, rpad), (0, 0)))
                cap_bits = ((3 * Lc // 2 + 17 * 10 + 255) // 256) * 256
                post = jax.vmap(lambda o: PE.order_and_pack_lane_packed(
                    o, jnp, max_bits=cap_bits,
                    return_words=True))
                for blk in range(nblk):
                    sl = slice(blk * lanes, (blk + 1) * lanes)
                    rec, fstate, misc, ev = run(packed[sl].T)
                    if depth == 4:
                        acc += rec.sum() + fstate.sum()
                        continue
                    ops = PE.slim_sort_operand_packed(rec, fstate, ev, jnp)
                    p, t, f = post(ops.T)
                    acc += p.astype(jnp.int32).sum() + t.sum()
            return padded(acc)

        return jax.jit(fn)

    names = ["floor (upload+fetch)", "+transform", "+emissions",
             "+compaction", "+slim kernel", "+records/order/pack"]
    prev = 0.0
    for depth, name in enumerate(names):
        comp, best = bench(mk_stage(depth), imgs)
        print(f"{name:26s}: {best*1e3:7.1f} ms  (+{(best-prev)*1e3:6.1f}) "
              f"[compile {comp:.0f} s]", flush=True)
        prev = best

    # full product path (includes blob scan compaction + real outputs)
    t0 = time.time()
    enc.encode_batch(np.asarray(imgs))
    comp = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        enc.encode_batch(np.asarray(imgs))
        ts.append(time.time() - t0)
    print(f"{'full encode_batch':26s}: {min(ts)*1e3:7.1f} ms  "
          f"(+{(min(ts)-prev)*1e3:6.1f}) [compile {comp:.0f} s]", flush=True)


if __name__ == "__main__":
    main()
