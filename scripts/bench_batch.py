import os, sys, time, hashlib
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
from PIL import Image
from icer_compression_tpu.models import grayscale as G
from icer_compression_tpu.models.grayscale import CodecConfig, _JAX_ENCODERS
from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder
from icer_compression_tpu.core.packets import build_packets_grayscale, rearrange_order_grayscale, sort_packets
from icer_compression_tpu.models.grayscale import allocate_from_table, assemble_stream, _bitplanes

img = np.asarray(Image.open(__file__.rsplit("/", 2)[0] + "/tests/data/boat.512.png").convert("L")).astype(np.uint16)
h, w = img.shape
cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=h*w)
B = int(os.environ.get("B", "4"))
# batch of distinct images (shifted variants)
imgs = np.stack([np.roll(img, i * 7, axis=1) for i in range(B)])

enc = JaxGrayscaleEncoder(w, h, cfg.stages, cfg.filt, cfg.segments, 15)
t0 = time.time()
results = enc.encode_batch(imgs)
print(f"B={B} first call (compile+run): {time.time()-t0:.1f} s")

def to_stream(table_ll):
    raw, ll_mean = table_ll
    table = {(0,) + k: v for k, v in raw.items()}
    packets = sort_packets(build_packets_grayscale(w, h, cfg.stages, ll_mean, _bitplanes(15)))
    nsegs = {(p.decomp_level, p.subband_type): cfg.segments for p in packets}
    encoded = allocate_from_table(packets, table, cfg.byte_quota, nsegs, w, h)
    return assemble_stream(encoded, rearrange_order_grayscale(_bitplanes(15)))

want = open(__file__.rsplit("/", 2)[0] + "/tests/data/golden_boat512.sha256").read().split()[0]
s0 = to_stream(results[0])
print("image0 sha match:", hashlib.sha256(s0).hexdigest() == want)
# each image must equal its single-image encode
s1 = to_stream(results[1])
r1 = enc.encode(imgs[1])
print("image1 == single-image encode:", s1 == to_stream(r1))

ts = []
for _ in range(4):
    t0 = time.time(); enc.encode_batch(imgs); ts.append(time.time()-t0)
best = min(ts)
print(f"B={B} best of 4: {best*1e3:.0f} ms = {B*h*w/best/1e6:.2f} MP/s encode (batched TPU)")
