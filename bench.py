#!/usr/bin/env python
"""Headline benchmark: 512x512 grayscale lossless encode+decode throughput.

Prints ONE JSON line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": x}

Baseline (BASELINE.md): the reference C build does 0.102 s encode +
0.119 s decode for the 512x512 boat image at stages=4, filter A,
6 segments, lossless quota => 512*512 / 0.221 s = 1.186 MP/s combined.

Three pipelines are measured and reported in ``detail``:
  native       -- the C++ host runtime (fused modelling+entropy, threaded
                  over segments), single image;
  tpu          -- the XLA/pallas TPU pipeline (fused encoder +
                  lane-batched decoder), single image: latency mode;
  tpu_batched  -- the same TPU pipeline with B images per device program
                  (shared entropy kernel lane blocks / decode lanes):
                  throughput mode.
The headline ``value`` is the best verified combined MP/s of the three;
every mode checks bit-exactness while timing (encoded stream sha-pinned
to the reference encoder's output, decode reproduces the pixels).

Env knobs: ICER_BENCH_REPS (default 15 native / 5 tpu), ICER_BENCH_BATCH
(decode-side serving batch, default 56: the decode stage-1 bucket fills
a single 1024-lane kernel block (1008/1024) and larger decode batches
measured WORSE, see PERF_NOTES round-5; 0 skips the batched mode),
ICER_BENCH_BATCH_ENC (encode-side serving batch, default 2x the decode
batch: encode device cost keeps amortizing -- 8.2 -> 5.1 ms/img from
B=56 to 112 -- so encode runs bigger batches and verification decodes
them in decode-batch chunks), ICER_BENCH_SKIP_TPU=1 (hosts without a
usable accelerator; native numbers only), ICER_BENCH_TPU_BUDGET
(seconds allowed for TPU warmup before the batched mode is skipped,
default 900).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_MPS = (512 * 512) / (0.102 + 0.119) / 1e6  # 1.186 MP/s


def load_image():
    from PIL import Image

    path = os.path.join(REPO, "tests", "data", "boat.512.png")
    if os.path.exists(path):
        return np.asarray(Image.open(path).convert("L")).astype(np.uint16)
    ref = "/root/reference/boat.512.bmp"
    return np.asarray(Image.open(ref).convert("L")).astype(np.uint16)


def best(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def main():
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig

    img = load_image()
    h, w = img.shape
    px = h * w
    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=px)
    golden = None
    gpath = os.path.join(REPO, "tests", "data", "golden_boat512.sha256")
    if os.path.exists(gpath):
        golden = open(gpath).read().split()[0]

    def sha_ok(stream):
        if golden is None:
            return None
        return hashlib.sha256(stream).hexdigest() == golden

    detail = {}
    candidates = []   # (mps, mode_name)

    # ---- native host runtime (latency reference) -----------------------
    reps = int(os.environ.get("ICER_BENCH_REPS", "15"))
    stream = G.compress(img, cfg)
    dec = np.asarray(G.decompress(stream, cfg, dtype=np.uint16))
    enc_s = best(lambda: G.compress(img, cfg), reps)
    dec_s = best(lambda: G.decompress(stream, cfg, dtype=np.uint16), reps)
    native = {
        "encode_s": round(enc_s, 4), "decode_s": round(dec_s, 4),
        "MPs": round(px / (enc_s + dec_s) / 1e6, 3),
        "stream_matches_reference": sha_ok(stream),
        "lossless_roundtrip": bool(np.array_equal(dec, img)),
    }
    detail["native"] = native
    if native["stream_matches_reference"] and native["lossless_roundtrip"]:
        candidates.append((native["MPs"], "native host runtime"))
    detail["stream_bytes"] = len(stream)

    # ---- TPU pipeline --------------------------------------------------
    skip_tpu = os.environ.get("ICER_BENCH_SKIP_TPU") == "1"
    budget = float(os.environ.get("ICER_BENCH_TPU_BUDGET", "900"))
    treps = int(os.environ.get("ICER_BENCH_REPS_TPU", "5"))
    # slim (sequential-core pallas kernel + XLA tail) is the fastest
    # measured backend on a real chip for both single-image and batched
    # encode; the library default stays "sorted" (XLA-only: runs on any
    # backend and hits the persistent compile cache).
    os.environ.setdefault("ICER_JAX_ENTROPY", "slim")
    if not skip_tpu:
        try:
            B = int(os.environ.get("ICER_BENCH_BATCH", "56"))
            # Encode and decode run at DIFFERENT serving batches: encode
            # device cost keeps amortizing with batch (fixed terms ~3
            # ms/img at B=56 halve at 112: measured 8.2 -> 5.1 ms/img,
            # probe_device_b round-5) while decode measured WORSE past
            # one stage-1 kernel block (B=56).  Encode batches are
            # decoded in B-sized chunks for verification.
            BE = int(os.environ.get("ICER_BENCH_BATCH_ENC",
                                    str(2 * B))) if B > 1 else B
            if BE < B or BE % B:
                BE = B
            rng = np.random.default_rng(0)
            if B > 1:
                from icer_compression_tpu.models.decode_jax import (
                    decompress_lanes_batch)
                from icer_compression_tpu.ops.encode_jax import (
                    JaxGrayscaleEncoder)
                imgs = np.stack([
                    np.clip(img.astype(np.int32)
                            + rng.integers(-6, 7, img.shape), 0, 255
                            ).astype(np.uint16) for _ in range(BE)])
                imgs[0] = img
                # slim: the sequential-core pallas coder whose kernel
                # blocks are shared across the batch (the amortizing
                # backend; measured ~3.4x the sorted backend's batched
                # throughput at B=8)
                enc = JaxGrayscaleEncoder(w, h, cfg.stages, cfg.filt,
                                          cfg.segments, 15, batch=BE,
                                          entropy="slim")
                from icer_compression_tpu.core.packets import (
                    build_packets_grayscale, rearrange_order_grayscale,
                    sort_packets)

                def finish(res):
                    streams = []
                    for (table, ll) in res:
                        packets = sort_packets(build_packets_grayscale(
                            w, h, cfg.stages, ll, 9))
                        nsegs = {(p.decomp_level, p.subband_type):
                                 cfg.segments for p in packets}
                        t = {(0,) + k: v for k, v in table.items()}
                        e = G.allocate_from_table(packets, t,
                                                  cfg.byte_quota, nsegs,
                                                  w, h)
                        streams.append(G.assemble_stream(
                            e, rearrange_order_grayscale(9)))
                    return streams

                def encode_all():
                    return finish(enc.encode_batch(imgs))

            # ---- warmup: all serving programs in PARALLEL threads ----
            # A fresh process's dominant cost is the attachment-side
            # first-execution load of each program; the loads overlap
            # when dispatched concurrently, so a serving process warms
            # everything at the wall of the SLOWEST program, not the
            # sum.  The batched-decode thread builds its streams with
            # the native host runtime (byte-identical codec => same
            # decode program) so it never waits on the batched encoder.
            import threading
            wt: dict = {}
            werr: list = []

            def _wrap(name, fn):
                def run():
                    try:
                        fn()
                    except Exception as e:  # noqa: BLE001
                        werr.append((name, e))
                return run

            def warm_single():
                t0 = time.time()
                wt["_ts"] = G.compress_jax(img, cfg)
                wt["single_encode"] = time.time() - t0
                t0 = time.time()
                wt["_tdec"] = np.asarray(G.decompress(
                    wt["_ts"], cfg, dtype=np.uint16, backend="jax",
                    pack8=True))
                wt["single_decode"] = time.time() - t0

            def warm_benc():
                t0 = time.time()
                wt["_streams"] = encode_all()
                wt["batched_encode"] = time.time() - t0

            def warm_bdec():
                ns = [G.compress(im, cfg) for im in imgs[:B]]
                t0 = time.time()
                decompress_lanes_batch(ns, cfg, dtype=np.uint16,
                                       pack8=True)
                wt["batched_decode"] = time.time() - t0
                # the pipelined mode also tries the half decode batch
                # (device metric measured it faster in some sessions;
                # the regime decides per run) -- warm its program too
                if B % 2 == 0 and B // 2 >= 2:
                    t0 = time.time()
                    decompress_lanes_batch(ns[:B // 2], cfg,
                                           dtype=np.uint16, pack8=True)
                    wt["batched_decode_half"] = time.time() - t0

            warm_t0 = time.time()
            threads = [threading.Thread(
                target=_wrap("single", warm_single))]
            if B > 1:
                threads.append(threading.Thread(
                    target=_wrap("benc", warm_benc)))
                threads.append(threading.Thread(
                    target=_wrap("bdec", warm_bdec)))
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            warm_total = time.time() - warm_t0
            if werr:
                raise werr[0][1]
            ts = wt["_ts"]
            tdec = wt["_tdec"]

            enc_s = best(lambda: G.compress_jax(img, cfg), treps)
            dec_s = best(
                lambda: G.decompress(ts, cfg, dtype=np.uint16,
                                     backend="jax", pack8=True), treps)
            tpu = {
                "encode_s": round(enc_s, 4), "decode_s": round(dec_s, 4),
                "MPs": round(px / (enc_s + dec_s) / 1e6, 3),
                "stream_matches_reference": sha_ok(ts),
                "lossless_roundtrip": bool(np.array_equal(tdec, img)),
                "warmup_s": round(warm_total, 1),
                "entropy_backend": os.environ.get("ICER_JAX_ENTROPY",
                                                  "sorted"),
            }
            detail["tpu"] = tpu
            if tpu["stream_matches_reference"] and tpu["lossless_roundtrip"]:
                candidates.append((tpu["MPs"], "tpu single-image"))

            if B > 1 and warm_total < budget:
                streams = wt["_streams"]        # BE streams
                # decode-verify EVERY encode stream, B at a time
                ok = streams[0] == stream
                for c0 in range(0, BE, B):
                    decs = decompress_lanes_batch(
                        streams[c0:c0 + B], cfg, dtype=np.uint16,
                        pack8=True)
                    ok = ok and all(
                        np.array_equal(d, i)
                        for d, i in zip(decs, imgs[c0:c0 + B]))
                # per-program warmup breakdown: each entry is that
                # program's first-call wall while the other threads'
                # loads ran concurrently; the total is warmup_s above
                detail["warmup_breakdown_s"] = {
                    k: round(v, 1) for k, v in wt.items()
                    if not k.startswith("_")}
                detail["warmup_breakdown_s"]["total_wall"] = round(
                    warm_total, 1)
                benc = best(encode_all, max(2, treps - 2))
                bdec = best(lambda: decompress_lanes_batch(
                    streams[:B], cfg, dtype=np.uint16, pack8=True),
                    max(2, treps - 2))
                enc_img = benc / BE
                dec_img = bdec / B
                tb = {
                    "B": B, "B_enc": BE,
                    "encode_s": round(benc, 4), "decode_s": round(bdec, 4),
                    "MPs": round(px / (enc_img + dec_img) / 1e6, 3),
                    "per_image_verified": bool(ok),
                }
                detail["tpu_batched"] = tb
                if ok:
                    candidates.append(
                        (tb["MPs"], f"tpu batched Benc={BE}/Bdec={B}"))

                # pipelined serving mode: K batches in flight, each
                # batch's fetch/host tail overlapped with the next
                # batch's upload + device time (async dispatch)
                K = int(os.environ.get("ICER_BENCH_PIPE", "4"))
                if K > 1:
                    def encode_pipe():
                        out, hold = [], None
                        for _ in range(K):
                            nxt = enc.encode_batch(imgs, defer=True)
                            if hold is not None:
                                out.extend(finish(hold()))
                            hold = nxt
                        out.extend(finish(hold()))
                        return out

                    def make_decode_pipe(bd):
                        def decode_pipe():
                            out, hold = [], None
                            for _ in range(K):
                                nxt = decompress_lanes_batch(
                                    streams[:bd], cfg, dtype=np.uint16,
                                    defer=True, pack8=True)
                                if hold is not None:
                                    out.extend(hold())
                                hold = nxt
                            out.extend(hold())
                            return out
                        return decode_pipe

                    decode_pipe = make_decode_pipe(B)

                    # Device-cost attribution via IN-PROCESS wall A/B:
                    # a floor program reproduces each pipeline's transfer
                    # shapes (same upload array, same fetch length) with
                    # ~no compute, so wall(pipeline) - wall(floor) is the
                    # pipeline's device compute this session.  Replaces
                    # the jax.profiler module times, which a server-side
                    # per-module profile cache stamps under arbitrary
                    # chip regimes (PERF_NOTES.md round-3; VERDICT r3
                    # weak #5).
                    #
                    # Methodology (VERDICT r4 weak #1): floor and variant
                    # walls are sampled INTERLEAVED in one loop (so a
                    # transfer-regime swing between the two sweeps cannot
                    # invert the subtraction), best-of-N each, and the
                    # difference is clamped at 0 with both raw values
                    # reported alongside.
                    try:
                        import jax
                        import jax.numpy as jnp

                        up8 = imgs.astype(np.uint8)
                        full_n = int(enc._fused(jnp.asarray(up8)).shape[0])

                        @jax.jit
                        def _enc_floor(x):
                            return jnp.zeros((full_n,), jnp.int32).at[
                                0].set(x.astype(jnp.int32).sum())

                        sbytes = np.frombuffer(b"".join(streams[:B]),
                                               np.uint8)
                        out_words = B * ((px + 3) // 4) + 1024

                        @jax.jit
                        def _dec_floor(s):
                            return jnp.zeros((out_words,), jnp.int32).at[
                                0].set(s.astype(jnp.int32).sum())

                        np.asarray(_enc_floor(up8))          # compile
                        np.asarray(_dec_floor(sbytes))       # compile

                        def bracketed(floor_fn, wall_fn, reps):
                            """Per-iteration BRACKETED A/B: every wall
                            sample subtracts the mean of its two
                            neighboring floor samples (floors are
                            transfer-dominated through this attachment,
                            so rate drift between adjacent calls is the
                            main subtraction error; bracketing bounds
                            it), then min over iterations, clamped >=0.
                            Returns (device_s, best_floor, best_wall)."""
                            fs, ws = [], []
                            for _ in range(reps):
                                t0 = time.perf_counter()
                                floor_fn()
                                fs.append(time.perf_counter() - t0)
                                t0 = time.perf_counter()
                                wall_fn()
                                ws.append(time.perf_counter() - t0)
                            t0 = time.perf_counter()
                            floor_fn()
                            fs.append(time.perf_counter() - t0)
                            diffs = sorted(
                                w - (fs[i] + fs[i + 1]) / 2
                                for i, w in enumerate(ws))
                            dev = diffs[len(diffs) // 2]  # median: a
                            # single floor-rate spike makes the MIN
                            # bracket understate device time badly
                            return max(0.0, dev), min(fs), min(ws)

                        enc_dev, floor_enc, wall_enc = bracketed(
                            lambda: np.asarray(_enc_floor(up8)),
                            lambda: np.asarray(
                                enc._fused(jnp.asarray(up8))), treps)
                        dec_dev, floor_dec, wall_dec = bracketed(
                            lambda: np.asarray(_dec_floor(sbytes)),
                            lambda: decompress_lanes_batch(
                                streams[:B], cfg, dtype=np.uint16,
                                pack8=True), treps)
                        enc_ms = enc_dev * 1e3 / BE
                        dec_ms = dec_dev * 1e3 / B
                        # transfer-free per-chip bound vs the 128 MP/s
                        # north star (VERDICT r4 item 9)
                        ceiling = (px / 1e6 / ((enc_ms + dec_ms) / 1e3)
                                   if enc_ms + dec_ms > 0 else None)
                        detail["device"] = {
                            "encode_ms_per_img": round(enc_ms, 2),
                            "decode_ms_per_img": round(dec_ms, 2),
                            "combined_MPs_ceiling": (
                                round(ceiling, 2) if ceiling else None),
                            "raw_walls_ms": {
                                "encode": round(wall_enc * 1e3, 1),
                                "decode": round(wall_dec * 1e3, 1)},
                            "floors_ms": {
                                "encode": round(floor_enc * 1e3, 1),
                                "decode": round(floor_dec * 1e3, 1)},
                            "note": ("bracketed in-process wall A/B vs "
                                     "same-shape transfer-floor programs "
                                     f"at Benc={BE}/Bdec={B}, median of "
                                     f"{treps} bracketed diffs, clamped "
                                     ">=0; decode includes host unpack"),
                        }
                    except Exception as e:  # noqa: BLE001
                        detail["device_error"] = f"{type(e).__name__}: {e}"

                    pstreams = encode_pipe()   # warm + verify
                    pok_e = ok and pstreams == streams * K
                    penc = best(encode_pipe, 2) / (K * BE)   # s/img

                    # decode pipeline: try the full and half decode
                    # batches, keep the best VERIFIED one (the regime
                    # decides; device-metric sessions disagreed on
                    # 28-vs-56, PERF_NOTES round-5)
                    dec_bs = [B] + ([B // 2]
                                    if B % 2 == 0 and B // 2 >= 2
                                    else [])
                    dec_runs = {}
                    for bd in dec_bs:
                        dp = make_decode_pipe(bd)
                        decs_p = dp()          # warm + verify
                        vok = all(np.array_equal(d, i) for d, i in
                                  zip(decs_p, list(imgs[:bd]) * K))
                        dec_runs[bd] = (best(dp, 2) / (K * bd), vok)
                    bd_best = min(
                        (v[0], bd) for bd, v in dec_runs.items()
                        if v[1])[1] if any(
                        v[1] for v in dec_runs.values()) else B
                    pdec, pok_d = dec_runs[bd_best]
                    pok = pok_e and pok_d
                    tp = {
                        "B": bd_best, "B_enc": BE,
                        "batches_in_flight": K,
                        "encode_s_per_img": round(penc, 5),
                        "decode_s_per_img": round(pdec, 5),
                        "decode_variants_ms_per_img": {
                            str(bd): round(v[0] * 1e3, 2)
                            for bd, v in dec_runs.items()},
                        "MPs": round(px / (penc + pdec) / 1e6, 3),
                        "per_image_verified": bool(pok),
                    }
                    detail["tpu_pipelined"] = tp
                    if pok:
                        candidates.append(
                            (tp["MPs"],
                             f"tpu pipelined Benc={BE}/"
                             f"Bdec={bd_best} x{K}"))
        except Exception as e:  # noqa: BLE001
            detail["tpu_error"] = f"{type(e).__name__}: {e}"

    mps, mode = max(candidates) if candidates else (0.0, "none")
    result = {
        "metric": ("MP/s encode+decode, 512x512 grayscale lossless "
                   "(stages=4, filter A, 6 segments), bit-exact vs "
                   f"lib_icer; best mode: {mode}"),
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / BASELINE_MPS, 2),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
