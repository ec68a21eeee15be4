#!/usr/bin/env python
"""Targeted on-chip cost probes for the fused encoder's remaining hot
stages (run after scripts/profile_encode.py showed emissions ~70 ms,
records/order/pack ~127 ms and a ~114 ms full-vs-stage gap).

Probes:
  1. full fused graph, output reduced to a sum  (isolates output
     materialization / concat / fetch from graph compute)
  2. emissions with the 4 small-table gathers replaced by packed-constant
     select chains (isolates gather cost in plane_analysis_lanes)
  3. the record tail sub-stages on the big bucket's real shapes:
     order-sort, +flush-detect, +pack-cumsum, +searchsorted, +word gather
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def bench(fn, *args, reps=5):
    t0 = time.time()
    np.asarray(fn(*args))
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return comp, min(ts)


PAD = 1 << 18


def main():
    which = set(sys.argv[1:]) or {"1", "2", "3"}
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder
    from icer_compression_tpu.ops import entropy_jax2 as E2
    from icer_compression_tpu.ops import pallas_entropy as PE

    img = np.asarray(Image.open("/root/reference/boat.512.bmp")
                     .convert("L")).astype(np.uint16)
    imgs = jnp.asarray(img[None].astype(np.int32))

    enc = JaxGrayscaleEncoder(512, 512, 4, 0, 6, 15, entropy="slim",
                              batch=1)

    def padded(x):
        return jnp.zeros((PAD,), jnp.int32).at[0].set(
            x.astype(jnp.int32).reshape(-1)[0])

    # ---- probe 1: full graph, summed output ---------------------------
    if "1" in which:
        inner = enc._make_fused_fn()

        def full_sum(images):
            return padded(inner(images).sum())

        comp, t = bench(jax.jit(full_sum), imgs)
        print(f"full graph, sum output : {t*1e3:7.1f} ms "
              f"[compile {comp:.0f} s]", flush=True)
        comp, t = bench(enc._fused, imgs)
        print(f"full graph, real output: {t*1e3:7.1f} ms "
              f"[compile {comp:.0f} s]", flush=True)

    # ---- probe 2: emissions gather vs packed-constant -----------------
    if "2" not in which:
        if "3" not in which:
            return
        _probe3(jax, jnp, enc, E2, PE, padded)
        return
    from icer_compression_tpu.ops import context_model as CM

    emit_fns = [enc._make_emit_fn(g) for g in enc.groups]

    def emissions_now(images):
        timg, ll, ov = jax.vmap(enc._transform_fn)(images)
        acc = jnp.int32(0)
        for f in emit_fns:
            w0, w1 = jax.vmap(f)(timg)
            acc += w0.sum() + w1.sum()
        return padded(acc)

    comp, t = bench(jax.jit(emissions_now), imgs)
    print(f"emissions (gather LUT) : {t*1e3:7.1f} ms [compile {comp:.0f} s]",
          flush=True)

    # monkeypatch the table lookups with packed-constant select chains
    def packed_lookup_arr(flat, width, idx, xp):
        words, per = E2._pack_table([int(v) for v in flat], width)
        return E2._packed_lookup(words, per, width, idx, xp)

    orig = CM.plane_analysis_lanes

    def patched(seg, subband_code, lsb, mag_bits, xp=np):
        from icer_compression_tpu.core import constants as C
        seg = seg.astype(xp.int32)
        sb = subband_code.reshape(subband_code.shape + (1, 1))
        mag_mask = (1 << mag_bits) - 1
        mag = seg & mag_mask
        neg = (seg >> mag_bits) & 1
        from icer_compression_tpu.ops.bitutils import msb_index
        msb = msb_index(mag | 1, xp)
        category = xp.clip(msb - lsb, 0, 3)
        bit = (mag >> lsb) & 1
        sig_cur = ((mag >> lsb) != 0).astype(xp.int32)
        sig_prev = ((mag >> (lsb + 1)) != 0).astype(xp.int32)
        sh_ = CM._shift
        w_sig = sh_(sig_cur, 0, -1, 0, xp)
        e_sig = sh_(sig_prev, 0, 1, 0, xp)
        n_sig = sh_(sig_cur, -1, 0, 0, xp)
        s_sig = sh_(sig_prev, 1, 0, 0, xp)
        d_sig = (sh_(sig_cur, -1, -1, 0, xp) + sh_(sig_cur, -1, 1, 0, xp)
                 + sh_(sig_prev, 1, -1, 0, xp) + sh_(sig_prev, 1, 1, 0, xp))
        h_raw = w_sig + e_sig
        v_raw = n_sig + s_sig
        is_hl = sb == C.SUBBAND_HL
        h_cnt = xp.where(is_hl, v_raw, h_raw)
        v_cnt = xp.where(is_hl, h_raw, v_raw)
        d_cnt = d_sig
        ctx_ll = packed_lookup_arr(CM._CTX_LL_FLAT, 4,
                                   h_cnt * 15 + v_cnt * 5 + d_cnt, xp)
        ctx_hh = packed_lookup_arr(CM._CTX_HH_FLAT, 4,
                                   (h_cnt + v_cnt) * 5 + d_cnt, xp)
        ctx_cat0 = xp.where(sb == C.SUBBAND_HH, ctx_hh, ctx_ll)
        ctx_cat1 = xp.where(h_cnt + v_cnt == 0, 9, 10)
        ctx = xp.where(
            category == 0, ctx_cat0,
            xp.where(category == 1, ctx_cat1,
                     xp.where(category == 2, 11, CM.CTX_UNCODED))
        ).astype(xp.int32)
        neg_sig = -(neg & sig_cur)
        neg_sig_prev = -(neg & sig_prev)
        shh = sh_(neg_sig, 0, -1, 0, xp) + sh_(neg_sig_prev, 0, 1, 0, xp) + 2
        svv = sh_(neg_sig, -1, 0, 0, xp) + sh_(neg_sig_prev, 1, 0, 0, xp) + 2
        sh2 = xp.where(is_hl, svv, shh)
        sv2 = xp.where(is_hl, shh, svv)
        sign_ctx = packed_lookup_arr(CM._SIGN_CTX_FLAT, 5,
                                     sh2 * 5 + sv2, xp)
        pred_sign = packed_lookup_arr(CM._SIGN_PRED_FLAT, 1,
                                      sh2 * 5 + sv2, xp)
        agreement = (pred_sign ^ neg) & 1
        sign_event = ((category == 0) & (bit == 1)).astype(xp.int32)
        return {"bit": bit, "ctx": ctx, "sign_event": sign_event,
                "agreement": agreement, "sign_ctx": sign_ctx}

    CM.plane_analysis_lanes = patched
    try:
        comp, t = bench(jax.jit(emissions_now), imgs)
        print(f"emissions (packed LUT) : {t*1e3:7.1f} ms "
              f"[compile {comp:.0f} s]", flush=True)
    finally:
        CM.plane_analysis_lanes = orig

    if "3" in which:
        _probe3(jax, jnp, enc, E2, PE, padded)


def _probe3(jax, jnp, enc, E2, PE, padded):
    # ---- probe 3: record-tail sub-stages on real shapes ----------------
    # big bucket: n lanes x (Lc + 17) records
    bk = enc.buckets[0]
    Lb = bk["L"]
    Lc = min(-(-Lb // 256) * 256, (-(-(3 * Lb) // 4) + 255) // 256 * 256)
    n = sum(enc.bitplanes * len(enc.groups[gi]["lanes"])
            for gi in bk["groups"])
    R = Lc + 17
    cap_bits = ((3 * Lc // 2 + 17 * 10 + 255) // 256) * 256
    rng = np.random.default_rng(0)
    code = jnp.asarray(rng.integers(0, 1 << 10, (n, R), dtype=np.int32))
    nbits = jnp.asarray(
        rng.choice([0, 1, 2, 3, 5, 10], (n, R),
                   p=[.55, .2, .1, .05, .05, .05]).astype(np.int32))
    opn = jnp.asarray(rng.integers(0, Lc, (n, R), dtype=np.int32))
    done_row = np.arange(R, dtype=np.int64)
    done = jnp.asarray(np.where(done_row < Lc, done_row, PE.BIG)
                       .astype(np.int32))
    print(f"tail shapes: n={n} R={R} cap_bits={cap_bits}", flush=True)

    def tail(depth):
        def one(c, nn, o):
            rec_valid = nn > 0
            rkey = jnp.where(rec_valid, o, PE.BIG)
            if depth == 0:
                return rkey.sum()
            skey, (c2, n2, d2, rv) = E2._sort_by(
                rkey, (c, nn, done, rec_valid.astype(jnp.int32)), jnp)
            if depth == 1:
                return skey.sum() + c2.sum()
            rv = rv != 0
            flush = E2.detect_flush_records(skey, d2, rv, jnp)
            if depth == 2:
                return flush.astype(jnp.int32).sum() + c2.sum()
            nb = n2 * rv
            off = jnp.cumsum(nb) - nb
            total = nb.sum()
            if depth == 3:
                return off.sum().astype(jnp.int32) + total
            W = (cap_bits + 31) // 32
            sh = (off & 31).astype(jnp.uint32)
            codew = (c2.astype(jnp.uint32)
                     & ((jnp.uint32(1) << nb.astype(jnp.uint32)) - 1))
            codew = jnp.where(rv, codew, jnp.uint32(0))
            lo = codew << sh
            hi = jnp.where(sh == 0, jnp.uint32(0),
                           codew >> ((jnp.uint32(32) - sh) & 31))
            wlo = off >> 5
            whi = wlo + 1
            queries = jnp.arange(W + 1, dtype=wlo.dtype)
            if depth == 4:
                b1 = jnp.searchsorted(wlo, queries, method="sort")
                b2 = jnp.searchsorted(whi, queries, method="sort")
                return (b1.sum() + b2.sum()).astype(jnp.int32) + lo.sum().astype(jnp.int32)
            if depth == 6:
                b1 = jnp.searchsorted(wlo, queries)
                b2 = jnp.searchsorted(whi, queries)
                return (b1.sum() + b2.sum()).astype(jnp.int32) + lo.sum().astype(jnp.int32)

            def words_from(contrib, wid):
                csum = jnp.cumsum(contrib, dtype=jnp.uint32)
                csum = jnp.concatenate(
                    [jnp.zeros(1, dtype=jnp.uint32), csum])
                bounds = jnp.searchsorted(wid, queries, method="sort")
                s = csum[bounds]
                return s[1:] - s[:-1]

            words = words_from(lo, wlo) + words_from(hi, whi)
            return words.sum().astype(jnp.int32) + total

        def fn():
            acc = jax.vmap(one)(code, nbits, opn).sum()
            return padded(acc)

        return jax.jit(fn)

    names = ["key only", "order sort", "+flush detect", "+pack cumsum",
             "+searchsorted(sort)", "full pack", "searchsorted(default)"]
    prev = 0.0
    for depth, name in enumerate([0, 1, 2, 3, 4, 5, 6]):
        comp, t = bench(tail(depth))
        print(f"tail {names[depth]:22s}: {t*1e3:7.1f} ms "
              f"(+{(t-prev)*1e3:6.1f}) [compile {comp:.0f} s]", flush=True)
        prev = t


if __name__ == "__main__":
    main()
