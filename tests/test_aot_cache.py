"""AOT executable cache: the first-execution miscompile guard.

A freshly cold-compiled wide decode program was once observed returning
wrong output on its FIRST execution while later recompiles of identical
code validated (PERF_NOTES round-4).  The cache therefore re-executes
every fresh compile on its first real inputs and compares outputs before
trusting or storing it; these tests drive that guard with injected
fakes (VERDICT r4 item 6).
"""

import numpy as np
import pytest

pytest.importorskip("jax")

from icer_compression_tpu.backend import aot_cache


class _FakeCompiled:
    """Stands in for a compiled executable; returns values from a
    scripted sequence (one entry per execution, last repeats)."""

    def __init__(self, seq):
        self.seq = list(seq)
        self.calls = 0

    def __call__(self, *args):
        i = min(self.calls, len(self.seq) - 1)
        self.calls += 1
        return np.asarray(self.seq[i])


class _FakeLowered:
    def __init__(self, make_compiled):
        self._make = make_compiled

    def compile(self):
        return self._make()


class _FakeJitted:
    def __init__(self, compiles):
        """compiles: list of _FakeCompiled returned by successive
        .lower().compile() calls (last repeats)."""
        self.compiles = list(compiles)
        self.n_lowered = 0

    def lower(self, *args):
        i = min(self.n_lowered, len(self.compiles) - 1)
        self.n_lowered += 1
        return _FakeLowered(lambda: self.compiles[i])


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("ICER_TPU_AOT_CACHE", str(tmp_path))
    monkeypatch.delenv("ICER_AOT_VERIFY", raising=False)
    return tmp_path


def test_good_program_passes(cache_dir):
    good = _FakeCompiled([np.arange(4)])
    jitted = _FakeJitted([good])
    comp = aot_cache._load_or_compile(jitted, "t-good", ("sig",),
                                      (np.zeros(2),))
    assert comp is good
    # the guard executed it twice before trusting it
    assert good.calls == 2


def test_flaky_first_execution_recompiles(cache_dir):
    """First compile's first execution disagrees with its re-execution
    (the observed hazard); the guard must invalidate it and serve the
    recompile instead."""
    flaky = _FakeCompiled([np.array([999]), np.array([1])])
    good = _FakeCompiled([np.array([1])])
    jitted = _FakeJitted([flaky, good])
    comp = aot_cache._load_or_compile(jitted, "t-flaky", ("sig",),
                                      (np.zeros(2),))
    assert comp is good
    assert jitted.n_lowered == 2
    # a repro note was written
    log = cache_dir / "first_exec_mismatch.log"
    assert log.exists() and "t-flaky" in log.read_text()


def test_persistent_mismatch_raises(cache_dir):
    """Two consecutive compiles both failing the determinism check is a
    hard error -- a possibly-wrong stream must never be served."""
    bad1 = _FakeCompiled([np.array([1]), np.array([2]), np.array([3])])
    bad2 = _FakeCompiled([np.array([4]), np.array([5]), np.array([6])])
    jitted = _FakeJitted([bad1, bad2])
    with pytest.raises(RuntimeError, match="first-execution"):
        aot_cache._load_or_compile(jitted, "t-bad", ("sig",),
                                   (np.zeros(2),))


def test_verify_opt_out(cache_dir, monkeypatch):
    monkeypatch.setenv("ICER_AOT_VERIFY", "0")
    flaky = _FakeCompiled([np.array([999]), np.array([1])])
    jitted = _FakeJitted([flaky])
    comp = aot_cache._load_or_compile(jitted, "t-optout", ("sig",),
                                      (np.zeros(2),))
    assert comp is flaky
    assert flaky.calls == 0   # no guard executions


def test_outputs_equal_tree():
    a = (np.arange(3), [np.zeros(2)])
    b = (np.arange(3), [np.zeros(2)])
    c = (np.arange(3), [np.ones(2)])
    assert aot_cache._outputs_equal(a, b)
    assert not aot_cache._outputs_equal(a, c)
