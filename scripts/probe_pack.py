#!/usr/bin/env python
"""On-chip pack_records vs pack_records_tree at the big-bucket shapes
(324 lanes x ~16.5k records), K reps inside one jit to amortize the
dispatch floor."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

K = 8


def bench(name, fn, *args, reps=4):
    import jax
    t0 = time.time()
    np.asarray(jax.block_until_ready(fn(*args)))
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.block_until_ready(fn(*args)))
        ts.append(time.time() - t0)
    print(f"{name:34s} compile {comp:6.1f}s  wall {min(ts)*1e3:8.1f} ms"
          f"  per-call {(min(ts)) / K * 1e3:7.2f} ms")


def main():
    import jax
    import jax.numpy as jnp
    from icer_compression_tpu.ops import entropy_jax2 as E2

    ROWS, R = 324, 16512 + 17
    cap_bits = ((16512 + 170 + 255) // 256) * 256
    rng = np.random.default_rng(0)
    nbits = rng.integers(0, 5, (ROWS, R)).astype(np.int32)
    code = rng.integers(0, 1 << 16, (ROWS, R)).astype(np.int32)
    code &= (1 << np.maximum(nbits, 1)) - 1
    valid = (rng.random((ROWS, R)) < 0.6) & (nbits > 0)
    code_j = jnp.asarray(code)
    nb_j = jnp.asarray(nbits)
    v_j = jnp.asarray(valid)

    def rep(pack):
        def f(c, n, v):
            acc = jnp.uint32(0)
            for _ in range(K):
                w, t, o = jax.vmap(
                    lambda cc, nn, vv: pack(cc, nn, vv, jnp,
                                            max_bits=cap_bits,
                                            with_overflow=True,
                                            return_words=True))(
                        c ^ acc.astype(jnp.int32), n, v)
                acc = acc + w.sum(dtype=jnp.uint32)
            return acc
        return jax.jit(f)

    bench("pack_records (merged sorts)", rep(E2.pack_records),
          code_j, nb_j, v_j)
    bench("pack_records_tree", rep(E2.pack_records_tree),
          code_j, nb_j, v_j)

    # correctness on chip at full shape
    w1, t1, o1 = jax.vmap(lambda c, n, v: E2.pack_records(
        c, n, v, jnp, max_bits=cap_bits, with_overflow=True,
        return_words=True))(code_j, nb_j, v_j)
    w2, t2, o2 = jax.vmap(lambda c, n, v: E2.pack_records_tree(
        c, n, v, jnp, max_bits=cap_bits, with_overflow=True,
        return_words=True))(code_j, nb_j, v_j)
    print("on-chip equal:",
          bool(jnp.array_equal(w1, w2)), bool(jnp.array_equal(t1, t2)),
          bool(jnp.array_equal(o1, o2)))


if __name__ == "__main__":
    main()
