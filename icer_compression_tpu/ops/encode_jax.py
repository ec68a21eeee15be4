"""TPU (XLA) encode pipeline: jit-compiled per image geometry.

Structure (all shapes static per (W, H, stages, filter, segments, dtype)):

  transform jit:          DWT stages -> LL mean removal -> sign-magnitude
  per-stage emissions jit: gather the stage's subband segments into one
      padded lane batch -> context-model emission streams (valid/ctx/bit)
      for every bitplane
  per-bucket entropy jit:  valid-first emission compaction, then the
      interleaved coder -- "sorted" (ops/entropy_jax2, default) or
      "pallas" (ops/pallas_entropy batched state-machine kernel, via
      ICER_JAX_ENTROPY=pallas) -- vmapped over all lanes of all stages
      whose padded emission length falls in the bucket

Stages are grouped into a small number of length buckets because the
entropy program's *compile* cost (via the remote TPU compiler) dominates
setup; two buckets keep padding waste ~1.4x while compiling the expensive
program only twice per geometry.  The persistent JAX compilation cache
amortizes across processes.

Rate allocation, headers/CRC and stream assembly stay on host (kilobytes).
Lanes hitting the 2048-codeword buffer flush (exactly detected on device)
or overflowing the compaction margin re-encode on host via the native
runtime.  encode_batch concatenates all images' lanes into shared wide
entropy kernel blocks (one device round trip per batch; the coder's
per-step cost is ~flat in lane width, so B images cost ~the sequential
steps of one).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..core import constants as C
from ..core.partition import partition_segments
from ..core.subbands import dim_low, subband_view
from ..core.status import IcerError, IcerStatus
from . import entropy_jax2, wavelet
from .context_model import plane_emissions_words

_CACHE_SET = False
_SPEC_POOL = None

# Byte-mass share of bitplane lsb (0 = LSB) for natural imagery, measured
# on the boat.512 lossless stream; also used by the quota prefix classes
# (models/grayscale).  Here it sizes per-plane payload caps: MSB planes
# code ~1/16 the bits of LSB planes, so a uniform ~1 bit/slot cap wastes
# most of the payload fetch on them.
PLANE_MASS = (0.225, 0.238, 0.214, 0.157, 0.080, 0.034, 0.020, 0.016,
              0.016)


def _plane_cap_bits(cap_bits: int, bitplanes: int):
    """Per-lsb payload caps: 3x the plane's boat-measured mean bit share
    (256-bit aligned, floor 1024); lanes that exceed their plane cap are
    flagged for the exact host fallback like a coder-buffer flush."""
    mass = PLANE_MASS[:bitplanes]
    mmax = max(mass)
    out = []
    for lsb in range(bitplanes):
        f = min(1.0, 3.0 * mass[lsb] / mmax)
        # the floor must not exceed the bucket's physical cap: a plane
        # cap beyond it would silently clamp in the device column slice
        # while the host layout stepped by the larger value
        out.append(min(cap_bits,
                       max(1024, ((int(cap_bits * f) + 255) // 256) * 256)))
    return out


def _ensure_cache():
    global _CACHE_SET
    if _CACHE_SET:
        return
    import jax
    cache_dir = os.environ.get(
        "ICER_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "icer_tpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _CACHE_SET = True


@dataclass(frozen=True)
class Lane:
    stage: int
    subband: int
    seg: int
    row: int       # absolute position of the segment in the image
    col: int
    h: int
    w: int


def _plan_groups(image_w, image_h, stages, segments):
    groups = []
    for stage in range(1, stages + 1):
        subs = [C.SUBBAND_HL, C.SUBBAND_LH, C.SUBBAND_HH]
        if stage == stages:
            subs = [C.SUBBAND_LL] + subs
        lanes: list[Lane] = []
        for sb in subs:
            view = subband_view(image_w, image_h, stage, sb)
            for rect in partition_segments(view.w, view.h, segments):
                lanes.append(Lane(stage, sb, rect.index,
                                  view.row + rect.row, view.col + rect.col,
                                  rect.h, rect.w))
        mh = max(l.h for l in lanes)
        mw = max(l.w for l in lanes)
        pix_valid = np.zeros((len(lanes), mh, mw), dtype=np.int32)
        for i, l in enumerate(lanes):
            pix_valid[i, :l.h, :l.w] = 1
        groups.append({
            "lanes": lanes, "mh": mh, "mw": mw, "L": 2 * mh * mw,
            "sub_codes": np.array([l.subband for l in lanes], np.int32),
            "pix_valid": pix_valid,
        })
    return groups


def _plan_buckets(groups):
    """Partition stage groups into emission-length buckets (ratio <= 2).

    Sorts over the bucket's padded emission length are ~75% of the slim
    backend's device program (trace, PERF_NOTES.md): letting a stage ride
    a bucket 4x its length quadrupled its rows' sort cost, which outweighs
    the extra program's (cached) compile.  Ratio 2 bounds padding waste
    at 2x while stages 3+/4 still share one tiny program.
    """
    order = sorted(range(len(groups)), key=lambda i: -groups[i]["L"])
    buckets = []
    cur = []
    cur_max = None
    for gi in order:
        L = groups[gi]["L"]
        if cur_max is None or L * 2 >= cur_max:
            cur.append(gi)
            cur_max = cur_max or L
        else:
            buckets.append({"groups": cur, "L": cur_max})
            cur, cur_max = [gi], L
    if cur:
        buckets.append({"groups": cur, "L": cur_max})
    return buckets


class JaxGrayscaleEncoder:
    """Compiled encoder for one image geometry (one channel).

    The whole encode -- transform, emissions, entropy, and the compaction
    of per-lane payloads into one contiguous blob -- is a single jitted
    program: one host->device transfer (the image) and two device->host
    transfers (blob + metadata).  This matters doubly on remotely-attached
    TPUs where each transfer costs ~0.1 s of latency.
    """

    def __init__(self, image_w: int, image_h: int, stages: int, filt: int,
                 segments: int, mag_bits: int,
                 entropy: str | None = None, batch: int = 1,
                 plane_cuts: tuple | None = None):
        _ensure_cache()
        import jax
        import jax.numpy as jnp
        # entropy backend: "sorted" (ops/entropy_jax2), "pallas" (the
        # original batched state-machine kernel) or "slim" (the default:
        # minimal-sequential-core kernel + XLA codeword reconstruction,
        # ops/pallas_entropy.make_encode_lanes_slim).
        if entropy is None:
            entropy = os.environ.get("ICER_JAX_ENTROPY", "sorted")
        if entropy not in ("sorted", "pallas", "slim"):
            raise ValueError(
                f"unknown entropy backend {entropy!r}: expected 'sorted', "
                "'pallas' or 'slim' (ICER_JAX_ENTROPY)")
        self.entropy = entropy
        self.jax, self.jnp = jax, jnp
        self.w, self.h = image_w, image_h
        self.stages, self.filt, self.segments = stages, filt, segments
        self.mag_bits = mag_bits
        self.batch = batch
        self.bitplanes = C.BITPLANES_8 if mag_bits == 7 else C.BITPLANES_16
        # adaptive speculation: arm the fallback-path host transforms
        # only after a batch actually needed them (see encode_batch)
        self._spec_wanted = False

        self.groups = _plan_groups(image_w, image_h, stages, segments)
        self.buckets = _plan_buckets(self.groups)
        # Quota-aware lane subsetting: plane_cuts[gi] bounds the lsb range
        # encoded for stage-group gi -- an int (lowest lsb, upper bound =
        # all planes) or an explicit (lo, hi) window.  The reference stops
        # coding at the quota (icer_compress.c:404); a cut encoder runs the
        # same program shape family over only the priority-prefix planes --
        # payloads are per-lane independent, so the encoded bytes are
        # identical to the full encoder's for every included packet, and a
        # window encoder produces exactly the DELTA planes an escalation
        # step needs (tables union across steps).
        if plane_cuts is None:
            plane_cuts = (0,) * len(self.groups)
        if len(plane_cuts) != len(self.groups):
            raise ValueError("plane_cuts must have one entry per stage")
        self.plane_cuts = tuple(
            (int(c[0]), int(c[1])) if isinstance(c, tuple)
            else (int(c), self.bitplanes) for c in plane_cuts)
        # lane order of the fused outputs: buckets in order, then groups,
        # images, planes, lanes -- mirrors the bucket fn's concat order
        # (a group's emission block is (batch * planes * lanes, L),
        # image-major).  Batching shares kernel lane blocks across images:
        # the slim coder's per-step cost is ~flat in lane width (measured,
        # PERF_NOTES.md), so B images cost ~the same sequential steps as 1.
        self.lane_keys: list[tuple] = []
        for b in self.buckets:
            for gi in b["groups"]:
                g = self.groups[gi]
                lo, hi = self.plane_cuts[gi]
                for img_i in range(batch):
                    for p in range(lo, hi):
                        for l in g["lanes"]:
                            self.lane_keys.append((img_i, l.stage, l.subband,
                                                   p, l.seg, l))
        self.n_lanes = len(self.lane_keys)
        from ..backend import aot_cache
        # serving warmup: dispatch through the disk cache of serialized
        # PJRT executables (deserialize ~0.7 s vs ~15-50 s per program
        # through the remote compile-cache handshake; backend/aot_cache)
        self._fused = aot_cache.wrap_jit(
            jax.jit(self._make_fused_fn()),
            f"fusedenc-{image_w}x{image_h}-s{stages}-f{filt}-g{segments}"
            f"-mb{mag_bits}-B{batch}-{self.entropy}-c{self.plane_cuts}")
        # Building the fused fn records each bucket's payload caps; the
        # static per-row (offset, cap) layout follows.  The slim backend
        # emits plane-major bands trimmed to per-plane caps (device
        # order: group, plane, img, lane); other backends emit uniform
        # rows in lane_keys order.
        n = self.n_lanes
        self._row_off = np.empty(n, np.int64)
        self._row_capb = np.empty(n, np.int64)
        r = 0
        off = 0
        for b in self.buckets:
            if self.entropy == "slim":
                for gi in b["groups"]:
                    lo, hi = self.plane_cuts[gi]
                    N = len(self.groups[gi]["lanes"])
                    P = hi - lo
                    caps = [b["plane_capb"][p] for p in range(lo, hi)]
                    band = [0]
                    for c in caps:
                        band.append(band[-1] + batch * N * c)
                    for img_i in range(batch):
                        for pi in range(P):
                            cb = caps[pi]
                            base = off + band[pi] + img_i * N * cb
                            for li in range(N):
                                self._row_off[r] = base + li * cb
                                self._row_capb[r] = cb
                                r += 1
                    off += band[-1]
            else:
                capb = b["capb"]
                rows_b = sum(
                    batch * (self.plane_cuts[gi][1]
                             - self.plane_cuts[gi][0])
                    * len(self.groups[gi]["lanes"]) for gi in b["groups"])
                for k in range(rows_b):
                    self._row_off[r] = off + k * capb
                    self._row_capb[r] = capb
                    r += 1
                off += rows_b * capb
        assert r == n
        # Compacted payload fetch: every lane's payload cap (and hence
        # row offset) is a multiple of the 32-byte / 8-word tile, so the
        # device program can gather each lane's ACTUAL payload tiles
        # into a dense blob sized by a static budget -- caps pad the
        # full layout ~2x over real streams, and the fetch is the encode
        # path's largest transfer.  A batch whose true tile total
        # exceeds the budget sets an overflow count in the meta row and
        # the host refetches through the full-layout program (exact,
        # rare; lazily compiled).
        assert (self._row_off % 32 == 0).all() \
            and (self._row_capb % 32 == 0).all()
        self._tile_off = (self._row_off // 32).astype(np.int32)
        self._cap_tiles = (self._row_capb // 32).astype(np.int32)
        total_cap_tiles = int(off // 32)
        factor = float(os.environ.get("ICER_FETCH_BUDGET", "0.62"))
        # compaction only pays when the full layout exceeds the 1 MiB
        # fetch floor (small geometries pad to it regardless, and skipping
        # them avoids double-compiling tiny test programs); the floor is
        # env-overridable so tests can exercise the path on small shapes
        floor_w = int(os.environ.get("ICER_COMPACT_FLOOR", str(1 << 18)))
        self._compact = (os.environ.get("ICER_COMPACT_FETCH", "1") != "0"
                         and factor < 1.0
                         and total_cap_tiles * 8 > floor_w)
        self._budget_tiles = min(
            total_cap_tiles,
            -(-int(factor * total_cap_tiles) // 8) * 8)
        self._total_cap_tiles = total_cap_tiles
        self._fused_full = None     # lazy full-layout fallback program
        self._siblings: dict[int, JaxGrayscaleEncoder] = {}
        self._transform = jax.jit(self._transform_fn)

    # ---- device functions ----------------------------------------------
    def _transform_fn(self, image):
        jnp = self.jnp
        img = image.astype(jnp.int32)
        img, overflow = wavelet.forward_stages(
            img, self.stages, self.filt, self.mag_bits, jnp)
        ll_w = dim_low(self.w, self.stages)
        ll_h = dim_low(self.h, self.stages)
        mask = (1 << (self.mag_bits + 1)) - 1
        ll = img[:ll_h, :ll_w]
        ll_mean = ((ll & mask).astype(jnp.uint32).sum()
                   // jnp.uint32(ll_w * ll_h)).astype(jnp.int32)
        img = img.at[:ll_h, :ll_w].set(
            wavelet._wrap(ll - ll_mean, self.mag_bits, jnp))
        img = wavelet.to_sign_magnitude(img, self.mag_bits, jnp)
        return img, ll_mean, overflow

    def _make_emit_fn(self, g, cut=(0, None)):
        jnp = self.jnp
        lanes, mh, mw = g["lanes"], g["mh"], g["mw"]
        lo, hi = cut
        planes = self.bitplanes if hi is None else hi

        N = len(lanes)
        # Per-lane rect extraction WITHOUT per-lane slices (formerly 78+
        # slice kernels per program, 0.09-0.13 ms launch each): gather
        # 8-element tile rows covering every (lane, row) run from the
        # flattened padded image -- XLA lowers a row gather as one
        # contiguous copy per index (the decode-window trick) -- then
        # align each lane by its static col%8 with one where-select per
        # distinct residue.  Over-read beyond a rect is masked to zero by
        # pix_valid below (insignificant-border semantics, as before).
        _wp = -(-(self.w + mw + 16) // 8) * 8
        _tiles = (mw + 7) // 8 + 1
        _starts = np.array([[(l.row + j) * _wp + l.col
                             for j in range(mh)] for l in lanes], np.int64)
        _tidx = np.clip(_starts[:, :, None] // 8
                        + np.arange(_tiles)[None, None, :],
                        0, ((self.h + mh) * _wp) // 8 - 1)
        _rolls = [int(l.col % 8) for l in lanes]

        def fn(img):
            imgp = jnp.pad(img, ((0, mh), (0, _wp - self.w)))
            view8 = imgp.reshape(-1, 8)
            rows8 = view8[jnp.asarray(_tidx.reshape(-1), jnp.int32)]
            x = rows8.reshape(N, mh, _tiles * 8)
            batch = jnp.zeros((N, mh, mw), jnp.int32)
            rl = jnp.asarray(np.array(_rolls, np.int32))[:, None, None]
            for k in sorted(set(_rolls)):
                batch = jnp.where(rl == k, x[:, :, k:k + mw], batch)
            sub_codes = jnp.asarray(g["sub_codes"])
            pix_valid = jnp.asarray(g["pix_valid"])
            batch = batch * pix_valid
            w0s, w1s = [], []
            for lsb in range(lo, planes):
                w0, w1 = plane_emissions_words(
                    batch, sub_codes, pix_valid, lsb, self.mag_bits, jnp)
                w0s.append(w0)
                w1s.append(w1)
            return (jnp.concatenate(w0s, axis=0),           # ((P-cut)*N, .)
                    jnp.concatenate(w1s, axis=0))

        return fn

    def _gather_compact_words(self, parts, Lb):
        """Pad/concat per-group packed slot words, interleave + compact.

        ``parts`` is a list of (w0, w1) packed emission-word pairs (rows,
        npx).  The coding order interleaves the two slots per pixel; sign
        slots are only valid for newly-significant one-bits, so a stable
        sort by (valid-first, slot position) both materializes the
        interleave *and* packs valid emissions to the front, letting every
        downstream O(L) stage run at Lc = 3/4 Lb (rounded to the entropy
        chunk).  The coder's output depends only on the subsequence of
        valid emissions, so the reordered invalid tail is immaterial.
        Lanes whose valid count exceeds Lc (sign fraction > 1/2; rare) are
        flagged for the existing host fallback.  Returns (words, over)
        with words (rows, Lc).
        """
        jax, jnp = self.jax, self.jnp
        half = Lb // 2
        Lc = min(Lb, (-(-(3 * Lb) // 4) + 255) // 256 * 256)
        w0s, w1s = [], []
        for (w0, w1) in parts:
            pad = half - w0.shape[-1]
            w0s.append(jnp.pad(w0, ((0, 0), (0, pad))))
            w1s.append(jnp.pad(w1, ((0, 0), (0, pad))))
        w0 = jnp.concatenate(w0s, axis=0)
        w1 = jnp.concatenate(w1s, axis=0)
        pos = jnp.arange(half, dtype=jnp.int32)
        k0 = jnp.where((w0 & 1) != 0, 2 * pos, Lb + 2 * pos)
        k1 = jnp.where((w1 & 1) != 0, 2 * pos + 1, Lb + 2 * pos + 1)
        key = jnp.concatenate([k0, k1], axis=-1)
        words = jnp.concatenate([w0, w1], axis=-1)
        over = ((words & 1) != 0).sum(axis=-1) > Lc

        pos_bits = (2 * Lb).bit_length()
        if pos_bits + 7 <= 31:
            # single-operand sort: the 7-bit emission word rides the
            # low bits of the (unique) interleave/compaction key, so the
            # sort carries one int32 instead of a (key, value) pair
            kw = (key << 7) | words

            def one(kw):
                return (jnp.sort(kw) & 127)[:Lc]

            return jax.vmap(one)(kw), over

        def one(k, w):
            _, (w2,) = entropy_jax2._sort_by(k, (w,), jnp)
            return w2[:Lc]

        return jax.vmap(one)(key, words), over

    def _make_bucket_fn(self, b):
        jnp = self.jnp
        Lb = b["L"]
        Lc = min(Lb, (-(-(3 * Lb) // 4) + 255) // 256 * 256)
        # payload cap ~1 bit per emission slot (+ flush slack): covers
        # every real stream comfortably (boat.512's densest lane runs
        # 0.91 b/slot); adversarial expansion beyond it lands in the
        # per-lane host fallback like a coder-buffer flush would
        cap_bits = ((Lc + 17 * 10 + 255) // 256) * 256
        b["capb"] = cap_bits // 8

        def fn(parts):
            words, over = self._gather_compact_words(parts, Lb)
            valid = words & 1
            ctx = (words >> 1) & 31
            bit = (words >> 6) & 1
            enc = self.jax.vmap(
                lambda v, c, x: entropy_jax2.encode_emissions_sorted(
                    v, c, x, jnp, max_bits=cap_bits, return_words=True))
            payload, total, flush = enc(valid, ctx, bit)
            return payload, total, flush | over

        return fn

    def _make_bucket_fn_pallas(self, b):
        """Bucket entropy via the pallas batched state-machine coder.

        Lanes are padded to blocks of PE.LANES columns and to a
        chunk-aligned emission length; the kernel produces the codeword
        record streams, and the sort-centric ordering/packing stages run
        vmapped per lane (identical to the "sorted" backend's tail).
        """
        jax, jnp = self.jax, self.jnp
        from . import pallas_entropy as PE

        Lb = b["L"]
        chunk = 256
        Lc = min(-(-Lb // chunk) * chunk,
                 (-(-(3 * Lb) // 4) + 255) // 256 * 256)
        # payload cap ~1 bit per emission slot (+ flush slack): covers
        # every real stream comfortably (boat.512's densest lane runs
        # 0.91 b/slot); adversarial expansion beyond it lands in the
        # per-lane host fallback like a coder-buffer flush would
        cap_bits = ((Lc + 17 * 10 + 255) // 256) * 256
        b["capb"] = cap_bits // 8
        run = PE.make_encode_lanes_pallas(Lc, chunk=chunk)

        def fn(parts):
            words, over = self._gather_compact_words(parts, Lb)
            if Lc > words.shape[-1]:
                words = jnp.pad(words,
                                ((0, 0), (0, Lc - words.shape[-1])))
            valid = words & 1
            ctx = (words >> 1) & 31
            bit = (words >> 6) & 1
            n = valid.shape[0]
            nblk = -(-n // PE.LANES)
            rpad = nblk * PE.LANES - n
            valid = jnp.pad(valid, ((0, rpad), (0, 0)))
            ctx = jnp.pad(ctx, ((0, rpad), (0, 0)))
            bit = jnp.pad(bit, ((0, rpad), (0, 0)))
            over = jnp.pad(over, (0, rpad))

            rowidx = jnp.arange(Lc + 17)
            done = jnp.where(rowidx < Lc, rowidx, PE.BIG)
            post = jax.vmap(lambda c, nn, o: PE.order_and_pack_lane(
                c, nn, o, done, jnp, max_bits=cap_bits, return_words=True))
            pls, tts, fls = [], [], []
            for blk in range(nblk):
                sl = slice(blk * PE.LANES, (blk + 1) * PE.LANES)
                code, nbits, opn = run(
                    valid[sl].T.astype(jnp.int32),
                    ctx[sl].T.astype(jnp.int32),
                    bit[sl].T.astype(jnp.int32))
                p, t, f = post(code.T, nbits.T, opn.T)
                pls.append(p)
                tts.append(t)
                fls.append(f)
            payload = jnp.concatenate(pls)[:n]
            total = jnp.concatenate(tts)[:n]
            flush = jnp.concatenate(fls)[:n] | over[:n]
            return payload, total, flush

        return fn

    def _make_bucket_fn_slim(self, b):
        """Bucket entropy via the slim pallas kernel.

        The kernel runs only the sequential recurrence (counters, bin,
        completion, state) over a single packed emission word per step;
        codeword reconstruction (slim_records) and the ordering/packing
        tail run in XLA.  Lanes are grouped into blocks of
        ICER_PALLAS_WIDTH (default 512) columns: rows wider than one vreg
        give the VPU independent work per vector op, hiding ALU latency
        in the serial chain, and fewer kernel invocations cut the total
        sequential step count.
        """
        jax, jnp = self.jax, self.jnp
        from . import pallas_entropy as PE

        Lb = b["L"]
        # chunk 128 halves the kernel's double-buffered block VMEM,
        # letting a 3456-lane block absorb B=21's 3402 rows in ONE
        # sequential pass -- measured a wash on chip (276.9 vs 268.1
        # ms/batch: the doubled grid-step count and the wider rows eat
        # the saved second pass), so the default stays 256/3072; the
        # knobs remain for other batch shapes
        chunk = int(os.environ.get("ICER_PALLAS_CHUNK", "256"))
        # The slim kernel runs over the UNCOMPACTED interleaved stream:
        # its per-step cost is flat in lane width and invalid slots are
        # no-ops, so paying 4/3 the (cheap, batch-amortized) kernel steps
        # beats the full-length compaction sort the other backends use
        # (a stack/reshape interleave measures ~1 elementwise pass on
        # TPU; the sort was ~7-9 ms at the big-bucket shape).
        Lk = -(-Lb // chunk) * chunk
        Lc = min(Lk, (-(-(3 * Lb) // 4) + 255) // 256 * 256)
        # Lane-block width: wider rows are ~free per step (ALU-latency-
        # bound serial chain, measured flat 128..1024 lanes and only
        # mildly super-linear to 3072), so the block absorbs ALL the
        # bucket's lanes up to a 3072 cap -- one sequential pass per
        # bucket instead of ceil(rows/2048) (B=14 on-chip A/B: 2 blocks
        # at 2048 -> 1 at 3072 took ~9% off the fused encode wall).
        width = int(os.environ.get("ICER_PALLAS_WIDTH", "0")) or (
            3456 if chunk <= 128 else 3072)
        # payload cap ~1 bit per compacted emission slot (+ flush slack):
        # covers every real stream comfortably (boat.512's densest lane
        # runs 0.91 b/slot); adversarial expansion beyond it lands in the
        # per-lane host fallback like a coder-buffer flush would
        cap_bits = ((Lc + 17 * 10 + 255) // 256) * 256
        b["capb"] = cap_bits // 8
        # per-plane caps: the flat output carries plane-major bands
        # trimmed to each plane's cap (MSB planes code ~1/16 of an LSB
        # plane's bits; trimming cuts the payload fetch ~30%+)
        plane_bits = _plane_cap_bits(cap_bits, self.bitplanes)
        b["plane_capb"] = [pb // 8 for pb in plane_bits]
        # static per-row plane caps (bucket row order: group, img, p, lane)
        row_caps = []
        for gi in b["groups"]:
            lo, hi = self.plane_cuts[gi]
            N = len(self.groups[gi]["lanes"])
            for _img in range(self.batch):
                for p in range(lo, hi):
                    row_caps.extend([plane_bits[p]] * N)
        row_caps = np.asarray(row_caps, np.int32)
        # Kernel lane width follows the FULL (uncut) row count so a
        # plane-cut (quota) variant reuses the exact Mosaic kernel shapes
        # of the full encoder (per-step cost is flat in width, so narrower
        # kernels would not run faster anyway -- only block count matters).
        full_n = sum(self.batch * self.bitplanes
                     * len(self.groups[gi]["lanes"]) for gi in b["groups"])

        def fn(parts):
            # interleave the two per-pixel slot words (the kernel's packed
            # emission format); invalid slots ride through as no-ops
            half = Lb // 2
            w0s, w1s = [], []
            for (w0, w1) in parts:
                pad = half - w0.shape[-1]
                w0s.append(jnp.pad(w0, ((0, 0), (0, pad))))
                w1s.append(jnp.pad(w1, ((0, 0), (0, pad))))
            w0 = jnp.concatenate(w0s, axis=0)
            w1 = jnp.concatenate(w1s, axis=0)
            packed = jnp.stack([w0, w1], axis=-1).reshape(w0.shape[0], Lb)
            if Lk > Lb:
                packed = jnp.pad(packed, ((0, 0), (0, Lk - Lb)))
            n = packed.shape[0]
            lanes = min(width, -(-full_n // PE.LANES) * PE.LANES)
            run = PE.make_encode_lanes_slim(Lk, chunk=chunk, lanes=lanes)
            nblk = -(-n // lanes)
            rpad = nblk * lanes - n
            packed = jnp.pad(packed, ((0, rpad), (0, 0)))

            if run.fused_key:
                post = jax.vmap(lambda o: PE.order_and_pack_lane_packed(
                    o, jnp, max_bits=cap_bits, slice_to=Lc,
                    return_words=True))
            else:
                post = jax.vmap(lambda o, k: PE.order_and_pack_lane_slim(
                    o, k, jnp, max_bits=cap_bits, slice_to=Lc,
                    return_words=True))
            pls, tts, fls = [], [], []
            for blk in range(nblk):
                sl = slice(blk * lanes, (blk + 1) * lanes)
                # the XLA reconstruction tail runs only over the block's
                # real rows, rounded up to the 8-row sublane tile
                # (unaligned row slices force relayout copies)
                m = min(lanes, -(-(n - blk * lanes) // 8) * 8)
                if run.fused_key:
                    rec, fstate, misc, ev = run(packed[sl].T)
                    ops = PE.slim_sort_operand_packed(rec, fstate, ev, jnp)
                    p, t, f = post(ops.T[:m])
                else:
                    r1, r2, fstate, misc, ev1, ev2 = run(packed[sl].T)
                    ops, keys = PE.slim_sort_operands(r1, r2, fstate, jnp,
                                                      ev1, ev2)
                    p, t, f = post(ops.T[:m], keys.T[:m])
                pls.append(p)
                tts.append(t)
                # in-kernel mid-plane fallback flag (eviction side-buffer
                # overflow) ORs into the host-fallback condition
                fls.append(f | (misc[0, :m] != 0))
            payload = jnp.concatenate(pls)[:n]
            total = jnp.concatenate(tts)[:n]
            # a lane over its PLANE cap re-encodes on host (exact), like
            # a coder-buffer flush
            flush = (jnp.concatenate(fls)[:n]
                     | (total > jnp.asarray(row_caps)))

            # flatten with plane-major bands trimmed to each plane's cap
            _dbg_blob = os.environ.get("ICER_DEBUG_BLOB", "")
            pieces = []
            row0 = 0
            for gi in b["groups"]:
                lo, hi = self.plane_cuts[gi]
                N = len(self.groups[gi]["lanes"])
                P = hi - lo
                rows_g = self.batch * P * N
                blk4 = payload[row0:row0 + rows_g].reshape(
                    self.batch, P, N, -1)
                for pi in range(P):
                    cw = b["plane_capb"][lo + pi] // 4
                    if _dbg_blob == "noflatten":
                        # cost probe ONLY (wrong blob content): same
                        # piece lengths, no strided plane slices
                        pieces.append(jnp.pad(
                            blk4.reshape(-1)[:1],
                            (0, self.batch * N * cw - 1)))
                    else:
                        pieces.append(blk4[:, pi, :, :cw].reshape(-1))
                row0 += rows_g
            return jnp.concatenate(pieces), total, flush

        return fn

    def _make_fused_fn(self, compact=None):
        jnp = self.jnp
        emit_fns = [
            self._make_emit_fn(g, cut) if cut[0] < cut[1] else None
            for g, cut in zip(self.groups, self.plane_cuts)]
        mk = {"pallas": self._make_bucket_fn_pallas,
              "slim": self._make_bucket_fn_slim,
              "sorted": self._make_bucket_fn}[self.entropy]
        bucket_fns = [mk(b) for b in self.buckets]

        def fused(images):
            # images: (batch, h, w); each group's emission block is
            # (batch * planes * lanes, L), image-major -- all images'
            # lanes share the entropy kernel blocks.
            img, ll_mean, overflow = self.jax.vmap(
                self._transform_fn)(images)
            emitted = []
            for fn in emit_fns:
                if fn is None:       # plane cut excludes the whole group
                    emitted.append(None)
                    continue
                w0, w1 = self.jax.vmap(fn)(img)
                emitted.append((w0.reshape(-1, w0.shape[-1]),
                                w1.reshape(-1, w1.shape[-1])))
            payloads, totals, flushes = [], [], []
            for b, bfn in zip(self.buckets, bucket_fns):
                parts = [emitted[gi] for gi in b["groups"]
                         if emitted[gi] is not None]
                if not parts:
                    continue
                payload, total, flush = bfn(parts)
                payloads.append(payload)
                totals.append(total)
                flushes.append(flush)
            nbits = jnp.concatenate(totals).astype(jnp.int32)   # (n_lanes,)
            flush = jnp.concatenate(
                [f.astype(jnp.int32) for f in flushes])

            # Output = metadata + the per-bucket padded payload word
            # matrices, flattened.  The static (rows, cap_words) layout
            # makes host slicing trivial and skips any on-device
            # compaction pass (a scan of dynamic_update_slices measured
            # ~100 ms/image here); everything stays in 32-bit lanes on
            # device (uint8 stacks/concats force costly relayouts on TPU)
            # and the host reinterprets the little-endian words as the
            # byte stream.
            pw = jnp.concatenate([p.astype(jnp.int32).reshape(-1)
                                  for p in payloads])
            do_compact = self._compact if compact is None else compact
            if os.environ.get("ICER_DEBUG_BLOB", "") == "nogather":
                # cost probe ONLY (wrong blob content): identical output
                # length, contiguous slice instead of the tile gather
                BT = self._budget_tiles
                meta = jnp.concatenate([
                    nbits, flush, ll_mean.astype(jnp.int32),
                    overflow.astype(jnp.int32),
                    (nbits.sum())[None].astype(jnp.int32)])
                padm = (-meta.shape[0]) % 8
                out = jnp.concatenate([
                    meta, jnp.zeros((padm,), jnp.int32),
                    pw[:BT * 8]])
                if out.shape[0] < (1 << 18):
                    out = jnp.pad(out, (0, (1 << 18) - out.shape[0]))
                return out
            if do_compact:
                # Gather each lane's ACTUAL payload tiles (8-word rows of
                # the caps-padded layout) into a dense budget-sized blob:
                # the fetch is the encode path's largest transfer and the
                # caps pad ~2x over real streams.  lane_of(o) = index of
                # the last lane whose exclusive-cumsum tile offset <= o
                # (one tiny scatter-add + cumsum); the row gather itself
                # is one contiguous 32-byte copy per tile
                # (scripts/probe_gather.py).
                BT = self._budget_tiles
                tiles = jnp.clip((nbits + 255) >> 8, 0,
                                 jnp.asarray(self._cap_tiles))   # (n,)
                toff = jnp.cumsum(tiles) - tiles            # exclusive
                total = toff[-1] + tiles[-1]
                mark = jnp.zeros((BT,), jnp.int32).at[
                    jnp.clip(toff, 0, BT - 1)].add(1)
                lane_of = jnp.cumsum(mark) - 1              # (BT,)
                src = (jnp.asarray(self._tile_off)[lane_of]
                       + jnp.arange(BT, dtype=jnp.int32)
                       - toff[lane_of])
                pt = pw.reshape(-1, 8)
                dense = pt[jnp.clip(src, 0, pt.shape[0] - 1)]
                meta = jnp.concatenate([
                    nbits, flush,
                    ll_mean.astype(jnp.int32),
                    overflow.astype(jnp.int32),
                    total[None].astype(jnp.int32),
                ])
                padm = (-meta.shape[0]) % 8    # 32B-align the dense blob
                out = jnp.concatenate([
                    meta, jnp.zeros((padm,), jnp.int32),
                    dense.reshape(-1)])
            else:
                meta = jnp.concatenate([
                    nbits, flush,
                    ll_mean.astype(jnp.int32),
                    overflow.astype(jnp.int32),
                ])
                out = jnp.concatenate([meta, pw])
            # Single >=1MiB output: tiny fetches stall on tunnel-attached
            # TPUs (see __init__).
            if out.shape[0] < (1 << 18):
                out = jnp.pad(out, (0, (1 << 18) - out.shape[0]))
            return out

        return fused

    # ---- host orchestration --------------------------------------------
    def encode_batch(self, images: np.ndarray, defer: bool = False,
                     upload_dtype=None):
        """Batched encode of (B, h, w) same-geometry images.

        One device round trip for the whole batch; all images' lanes share
        the entropy kernel blocks (the amortization: the coder's per-step
        cost is ~flat in lane width).  Returns a list of
        (payload_table, ll_mean) pairs.  With ``defer`` the call returns a
        zero-arg collector right after the async dispatch, so a pipelined
        caller can overlap the next batch's upload + compute with this
        batch's fetch + host unpack.  ``upload_dtype`` pins the upload
        representation (e.g. np.uint8 for 8-bit serving), skipping the
        per-call max() scan and making the compiled-program choice
        deterministic; by default 8-bit-valued unsigned batches
        auto-downcast.
        """
        B = images.shape[0]
        if B != self.batch:
            sib = self._siblings.get(B)
            if sib is None:
                sib = JaxGrayscaleEncoder(
                    self.w, self.h, self.stages, self.filt, self.segments,
                    self.mag_bits, entropy=self.entropy, batch=B,
                    plane_cuts=self.plane_cuts)
                self._siblings[B] = sib
            return sib.encode_batch(images, defer=defer,
                                    upload_dtype=upload_dtype)
        # 8-bit-valued batches upload as uint8 (half the transfer; the
        # transform widens to int32 on device, so streams are identical)
        up = images
        if upload_dtype is not None:
            if up.dtype != upload_dtype:
                up = up.astype(upload_dtype)
        elif up.dtype.kind == "u" and up.dtype.itemsize > 1 \
                and up.max() < 256:
            up = up.astype(np.uint8)
        dev = self._fused(self.jnp.asarray(up))
        # Speculative host transforms: a host-fallback lane (eviction
        # side-buffer overflow or a payload past its plane cap) needs the
        # transformed image on host, and the host DWT is ~50 ms/image
        # AFTER the fetch.  Fallbacks are rare now that the kernel
        # handles circular-buffer evictions itself, so speculate only
        # while recent batches actually used the fallback path (the
        # threads otherwise burn every host core for nothing).
        spec = (self._speculative_transforms(images)
                if self._spec_wanted else None)
        if defer:
            return lambda: self._unpack_batch(
                np.asarray(dev).view(np.uint8), images, spec, up=up)
        return self._unpack_batch(np.asarray(dev).view(np.uint8), images,
                                  spec, up=up)

    def _speculative_transforms(self, images):
        from ..backend import native_backend
        if not native_backend.available():
            return None
        from concurrent.futures import ThreadPoolExecutor
        from ..models.grayscale import transform_for_encode
        global _SPEC_POOL
        if _SPEC_POOL is None:
            _SPEC_POOL = ThreadPoolExecutor(max_workers=4)

        def one(img):
            t, _ = transform_for_encode(img, self.stages, self.filt,
                                        self.mag_bits)
            return np.ascontiguousarray(t, dtype=np.int32)

        return [_SPEC_POOL.submit(one, images[i])
                for i in range(images.shape[0])]

    def encode(self, image: np.ndarray):
        """-> (payload_table {(stage,subband,lsb,seg): (bytes, nbits)},
        ll_mean)."""
        if self.batch != 1:
            raise ValueError("encode() requires batch == 1")
        return self.encode_batch(image[None])[0]

    def _unpack_batch(self, out: np.ndarray, images: np.ndarray,
                      spec=None, compact=None, up=None):
        n = self.n_lanes
        B = self.batch
        compact = self._compact if compact is None else compact
        mw = 2 * n + 2 * B + (1 if compact else 0)
        meta_bytes = 4 * (-(-mw // 8) * 8 if compact else mw)
        meta = out[:4 * mw].view(np.int32)
        nbits = meta[:n]
        flush = meta[n:2 * n]
        ll_means = meta[2 * n:2 * n + B]
        overflows = meta[2 * n + B:2 * n + 2 * B]
        for i in range(B):
            if overflows[i]:
                raise IcerError(IcerStatus.INTEGER_OVERFLOW,
                                "wavelet transform")
            if int(ll_means[i]) > (1 << self.mag_bits) - 1:
                raise IcerError(IcerStatus.INTEGER_OVERFLOW, "ll mean")

        if compact:
            total_tiles = int(meta[2 * n + 2 * B])
            if total_tiles > self._budget_tiles:
                # the batch's true payload exceeded the fetch budget:
                # refetch through the full-layout program (exact; lazily
                # compiled -- a rare content class pays one compile).
                # ``up`` is the EXACT array the primary pass uploaded,
                # so a pinned upload_dtype carries through unchanged.
                if self._fused_full is None:
                    self._fused_full = self.jax.jit(
                        self._make_fused_fn(compact=False))
                if up is None:
                    up = images
                    if up.dtype.kind == "u" and up.dtype.itemsize > 1 \
                            and up.max() < 256:
                        up = up.astype(np.uint8)
                out = np.asarray(
                    self._fused_full(self.jnp.asarray(up))).view(np.uint8)
                return self._unpack_batch(out, images, spec,
                                          compact=False)
            tiles = np.clip((nbits.astype(np.int64) + 255) >> 8, 0,
                            self._cap_tiles)
            toff = np.cumsum(tiles) - tiles
            row_off = meta_bytes + toff * 32
        else:
            # per-lane payload rows at their static offsets (__init__)
            row_off = meta_bytes + self._row_off

        tables: list[dict[tuple, tuple[bytes, int]]] = [
            {} for _ in range(B)]
        fallback: list[tuple] = []    # (img_i, key, lane)
        for r, key in enumerate(self.lane_keys):
            if flush[r]:
                fallback.append((key[0], key[1:5], key[5]))
                continue
            nb = int(nbits[r])
            o = int(row_off[r])
            tables[key[0]][key[1:5]] = (
                out[o:o + (nb + 7) // 8].tobytes(), nb)

        self._spec_wanted = bool(fallback)
        if fallback:
            from ..backend import native_backend
            from ..models.grayscale import transform_for_encode
            t_cache: dict[int, np.ndarray] = {}

            def transformed(img_i):
                img_np = t_cache.get(img_i)
                if img_np is None:
                    if spec is not None:
                        t_cache[img_i] = spec[img_i].result()
                    else:
                        img_np, _ = transform_for_encode(
                            images[img_i], self.stages, self.filt,
                            self.mag_bits)
                        t_cache[img_i] = np.ascontiguousarray(
                            img_np, dtype=np.int32)
                return t_cache[img_i]

            if native_backend.available():
                # One threaded native call per image: the C++ runtime's
                # fused modelling+entropy per single-plane task is ~10x
                # the python plane_emissions path per lane.
                by_img: dict[int, list[tuple]] = {}
                for (img_i, key, l) in fallback:
                    by_img.setdefault(img_i, []).append((key, l))
                for img_i, items in by_img.items():
                    img_np = transformed(img_i)
                    tasks = [{
                        "seg_off": l.row * self.w + l.col,
                        "h": l.h, "w": l.w, "rowstride": self.w,
                        "subband": key[1], "mag_bits": self.mag_bits,
                        "lsb0": key[2],
                    } for (key, l) in items]
                    out_pl, out_bits = native_backend.encode_segments_native(
                        img_np, tasks, nplanes=1)
                    for i, (key, l) in enumerate(items):
                        nb = int(out_bits[i])
                        tables[img_i][key] = (
                            out_pl[i, : (nb + 7) // 8].tobytes(), nb)
            else:
                from ..backend import sequential
                from .context_model import plane_emissions
                for (img_i, key, l) in fallback:
                    img_np = transformed(img_i)
                    stage, subband, lsb, seg = key
                    data = img_np[l.row:l.row + l.h, l.col:l.col + l.w]
                    v, c, b = plane_emissions(data, subband, lsb,
                                              self.mag_bits)
                    pl, nb, _ = sequential.encode_emissions(v, c, b)
                    tables[img_i][key] = (pl, nb)
        return [(tables[i], int(ll_means[i])) for i in range(B)]
