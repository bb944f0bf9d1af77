"""Driver entry points stay importable and jittable.

`__graft_entry__.entry()` is compile-checked single-chip by the round
driver; `dryrun_multichip` is exercised separately on a virtual CPU mesh
(and by tests/test_training.py's trainer tests, which cover the same
Trainer path on the 8-device conftest mesh).
"""
import sys
import pathlib

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    mean, value = jax.jit(fn)(*args)
    batch = args[1].shape[0]
    assert mean.shape == (batch, 4)
    assert value.shape[0] == batch
    assert bool(jax.numpy.isfinite(mean).all())
