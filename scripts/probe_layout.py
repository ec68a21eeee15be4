#!/usr/bin/env python
"""On-chip cost probes for layout primitives the sort-free encode tail
would lean on: stride-2 minor slices, transposes, sorts along either
dimension, reshape-interleave.  Shapes mirror the 512x512 big bucket
(324 lanes x ~22k records).  Each op runs K times inside one jit (with
a data dependency between reps) so the ~100 ms tunnel dispatch floor
amortizes away; printed per-rep time subtracts the measured floor.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

K = 16
FLOOR = [0.0]


def bench(name, fn, *args, reps=5):
    import jax
    t0 = time.time()
    np.asarray(jax.block_until_ready(fn(*args)))
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.block_until_ready(fn(*args)))
        ts.append(time.time() - t0)
    per = (min(ts) - FLOOR[0]) / K
    print(f"{name:42s} compile {comp:6.1f}s  wall {min(ts)*1e3:8.1f} ms"
          f"  per-op {per*1e3:7.2f} ms")
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    ROWS, L = 324, 22016
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (ROWS, L), dtype=np.int32))
    xt = jnp.asarray(rng.integers(0, 1 << 20, (L, ROWS), dtype=np.int32))
    bvec = jnp.asarray(rng.integers(0, 512, (ROWS,), dtype=np.int32))

    def rep(body):
        def f(a):
            acc = jnp.int32(0)
            for i in range(K):
                acc = acc + body(a ^ acc)
            return acc
        return jax.jit(f)

    noop = rep(lambda a: a[0, 0])
    t0 = time.time()
    np.asarray(noop(x))
    ts = []
    for _ in range(5):
        t1 = time.time()
        np.asarray(noop(x))
        ts.append(time.time() - t1)
    FLOOR[0] = min(ts)
    print(f"dispatch floor: {FLOOR[0]*1e3:.1f} ms "
          f"(compile {time.time()-t0:.1f}s)")

    bench("elementwise x3 (ROWS,L)", rep(lambda a: ((a * 3 + 1) ^ (a >> 3))
                                         .sum(dtype=jnp.int32)), x)
    bench("stride2 minor (ROWS,L)",
          rep(lambda a: (a[:, 0::2] + a[:, 1::2]).sum(dtype=jnp.int32)), x)
    bench("transpose (ROWS,L)->(L,ROWS)",
          rep(lambda a: a.T.sum(dtype=jnp.int32)), x)
    bench("interleave minor stack/reshape",
          rep(lambda a: jnp.stack([a[:, :L // 2], a[:, L // 2:]], axis=-1)
              .reshape(a.shape).sum(dtype=jnp.int32)), x)
    bench("sort minor (ROWS,L) 1-op",
          rep(lambda a: jax.lax.sort((a,), dimension=1, num_keys=1)[0]
              .sum(dtype=jnp.int32)), x)
    bench("sort minor 2-op stable",
          rep(lambda a: sum(o.sum(dtype=jnp.int32) for o in jax.lax.sort(
              (a, a + 1), dimension=1, num_keys=1, is_stable=True))), x)
    bench("sort minor 3-op stable",
          rep(lambda a: sum(o.sum(dtype=jnp.int32) for o in jax.lax.sort(
              (a, a + 1, a ^ 5), dimension=1, num_keys=1,
              is_stable=True))), x)
    bench("sort major (L,ROWS) 1-op",
          rep(lambda a: jax.lax.sort((a,), dimension=0, num_keys=1)[0]
              .sum(dtype=jnp.int32)), xt)

    def condroll(a):
        out = a
        for m in range(9):
            sh = jnp.concatenate(
                [jnp.zeros((ROWS, 1 << m), out.dtype),
                 out[:, : L - (1 << m)]], axis=1)
            out = jnp.where(((bvec >> m) & 1)[:, None] != 0, sh, out)
        return out.sum(dtype=jnp.int32)

    bench("cond-roll x9 minor (ROWS,L)", rep(condroll), x)

    def cumsum_minor(a):
        return jnp.cumsum(a, axis=1).sum(dtype=jnp.int32)

    bench("cumsum minor (ROWS,L)", rep(cumsum_minor), x)


if __name__ == "__main__":
    main()
