"""Driver entry-point contract tests: entry() compiles and runs; the
multi-chip training-step dryrun executes on the 8-device CPU mesh."""

import sys

import jax
import numpy as np


def test_entry_forward():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 384)
    norms = np.linalg.norm(np.asarray(out), axis=1)
    np.testing.assert_allclose(norms, np.ones(8), atol=1e-3)


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # dp=4 x tp=2 mesh, one real training step


def test_dryrun_multichip_odd():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(1)
