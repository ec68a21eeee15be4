"""Disk cache of serialized PJRT executables (serving warmup).

Through the remotely-attached TPU compiler, even a persistent-compile-
-cache HIT costs ~15-50 s per program (the round-3 warmup floor).  A
serialized compiled executable loads in well under a second and first-
-executes in a few seconds (scripts/probe_aot.py: deserialize 0.7 s,
first exec 4.7 s for the B=21 fused encoder vs ~44 s via the compile
cache), so a serving process can start from disk instead of negotiating
with the compiler service.

``wrap_jit(jitted, key)`` returns a drop-in callable:
  - cache HIT: deserialize the executable and call it directly (no
    tracing, no lowering, no compiler round trip);
  - cache MISS: lower + compile once via the jitted function's own
    machinery, serialize the result for next time, and call it.

The cache key combines the caller's semantic key (geometry, config,
batch, backend knobs), the runtime input signature, every ICER_*
environment variable (graph shape can depend on them), the jax version
and a fingerprint of this package's sources -- a code change invalidates
the cache wholesale rather than risking a stale executable.

Freshly compiled programs are NOT trusted on first execution: a cold-
compiled wide (768/1024-lane) decode program was once observed returning
a wrong checksum on its first execution while every later recompile of
identical code validated (PERF_NOTES round-4 "wide-program
first-execution hazard").  Before an executable is stored (and before
its first output is returned), `_first_exec_check` runs it twice on the
caller's real first inputs and compares the outputs bit for bit; a
mismatch invalidates the executable, recompiles once, and re-checks --
a second mismatch raises (bit-exactness is the codec's contract; a
silently wrong stream must never escape).  The extra cost is one
steady-state execution per fresh compile (cache hits skip the check).

Env: ICER_TPU_AOT=0 disables; ICER_TPU_AOT_CACHE overrides the
directory (default ~/.cache/icer_tpu_aot); ICER_AOT_VERIFY=0 skips the
first-execution check.  Executables are ~100 MB each;
`prune(keep_latest=N)` trims old entries by mtime.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading

_lock = threading.Lock()


def _dir() -> str:
    # read at call time so callers may set the env var after import
    return os.environ.get("ICER_TPU_AOT_CACHE",
                          os.path.join(os.path.expanduser("~"), ".cache",
                                       "icer_tpu_aot"))
_code_fp = None


def enabled() -> bool:
    return os.environ.get("ICER_TPU_AOT", "1") != "0"


def _code_fingerprint() -> str:
    """Hash of every package source file (content, not mtime)."""
    global _code_fp
    if _code_fp is None:
        h = hashlib.sha256()
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for root, _dirs, files in sorted(os.walk(pkg)):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    h.update(p.encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
        _code_fp = h.hexdigest()[:16]
    return _code_fp


def _env_fp() -> str:
    items = sorted(f"{k}={v}" for k, v in os.environ.items()
                   if k.startswith("ICER_") and k != "ICER_TPU_AOT_CACHE")
    return hashlib.sha256("\n".join(items).encode()).hexdigest()[:12]


def _device_fp() -> str:
    """Identity of the attached accelerator: a serialized executable is
    only valid for the device (kind, count, runtime) it was built for."""
    import jax
    try:
        devs = jax.devices()
        kind = devs[0].device_kind if devs else "?"
        plat = devs[0].platform if devs else "?"
        n = len(devs)
    except Exception:
        kind, plat, n = "?", "?", 0
    ver = ""
    try:
        import jaxlib
        ver = getattr(jaxlib, "__version__", "")
    except Exception:
        pass
    try:
        import libtpu
        ver += "+" + getattr(libtpu, "__version__", "")
    except Exception:
        pass
    return f"{plat}:{kind}:{n}:{ver}"


def _key_path(sem_key: str, sig) -> str:
    import jax
    raw = "|".join([sem_key, repr(sig), jax.__version__,
                    _code_fingerprint(), _env_fp(), _device_fp()])
    return os.path.join(_dir(),
                        hashlib.sha256(raw.encode()).hexdigest()[:28]
                        + ".pjrt")


def wrap_jit(jitted, sem_key: str):
    """Wrap a jitted single-output function with the executable cache.

    Only engages on non-CPU backends (CPU compiles are local and fast);
    any failure in the AOT path falls back to the jitted callable.
    """
    if not enabled():
        return jitted
    compiled = {}

    def call(*args):
        import jax
        import jax.numpy as jnp
        try:
            if jax.default_backend() == "cpu":
                return jitted(*args)
        except Exception:
            return jitted(*args)
        jargs = [a if hasattr(a, "dtype") else jnp.asarray(a)
                 for a in args]
        sig = tuple((tuple(a.shape), str(a.dtype)) for a in jargs)
        comp = compiled.get(sig)
        if comp is None:
            with _lock:
                comp = compiled.get(sig)
                if comp is None:
                    comp = _load_or_compile(jitted, sem_key, sig, jargs)
                    compiled[sig] = comp
        if comp is False:          # AOT path unavailable: plain jit
            return jitted(*jargs)
        return comp(*jargs)

    call._aot_sem_key = sem_key
    call._jitted = jitted
    return call


def _outputs_equal(a, b) -> bool:
    import numpy as np
    from jax import tree_util

    la, lb = tree_util.tree_leaves(a), tree_util.tree_leaves(b)
    if len(la) != len(lb):
        return False
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def _first_exec_check(comp, jargs, sem_key) -> bool:
    """Execute a freshly compiled program twice on its first real inputs
    and compare outputs (the wide-program first-execution hazard guard).

    Returns True when the two executions agree bit for bit.  On mismatch
    a repro note is written next to the cache so the event is never
    silent."""
    if os.environ.get("ICER_AOT_VERIFY", "1") == "0":
        return True
    out1 = comp(*jargs)
    out2 = comp(*jargs)
    if _outputs_equal(out1, out2):
        return True
    try:
        os.makedirs(_dir(), exist_ok=True)
        with open(os.path.join(_dir(), "first_exec_mismatch.log"),
                  "a") as f:
            import datetime
            f.write(f"{datetime.datetime.now().isoformat()} "
                    f"sem_key={sem_key!r}: first execution of a freshly "
                    "compiled program disagreed with its re-execution\n")
    except OSError:
        pass
    return False


def _load_or_compile(jitted, sem_key, sig, jargs):
    path = _key_path(sem_key, sig)
    try:
        from jax.experimental import serialize_executable as se
    except Exception:
        return False
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                blob = pickle.load(f)
            return se.deserialize_and_load(*blob)
        except Exception:
            try:
                os.unlink(path)
            except OSError:
                pass
    try:
        comp = jitted.lower(*jargs).compile()
    except Exception:
        return False
    if not _first_exec_check(comp, jargs, sem_key):
        # Invalidate and recompile once; identical-code recompiles were
        # observed to validate.  A second failure is a hard error: the
        # codec's contract is bit-exactness and this program cannot be
        # trusted.
        comp = jitted.lower(*jargs).compile()
        if not _first_exec_check(comp, jargs, sem_key):
            raise RuntimeError(
                f"compiled program for {sem_key!r} failed the "
                "first-execution determinism check twice; refusing to "
                "serve possibly-wrong output (see "
                "first_exec_mismatch.log in the AOT cache dir)")
    try:
        blob = se.serialize(comp)
        os.makedirs(_dir(), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(blob, f)
        os.replace(tmp, path)
        # executables are ~100-200 MB and a code change orphans every
        # old entry (the key includes the source fingerprint): trim the
        # least-recently-used tail after each new save
        prune()
    except Exception:
        pass
    return comp


def prune(keep_latest: int = 32) -> int:
    """Delete all but the most-recently-used N executables."""
    try:
        d = _dir()
        entries = [(os.path.getmtime(os.path.join(d, f)),
                    os.path.join(d, f))
                   for f in os.listdir(d) if f.endswith(".pjrt")]
    except OSError:
        return 0
    entries.sort(reverse=True)
    n = 0
    for _mt, p in entries[keep_latest:]:
        try:
            os.unlink(p)
            n += 1
        except OSError:
            pass
    return n
