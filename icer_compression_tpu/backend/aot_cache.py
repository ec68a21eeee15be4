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

Env: ICER_TPU_AOT=0 disables; ICER_TPU_AOT_CACHE overrides the
directory (default ~/.cache/icer_tpu_aot).  Executables are ~100 MB
each; `prune(keep_latest=N)` trims old entries by mtime.
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
