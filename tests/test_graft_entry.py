"""Driver entry-point regression guards: entry() must stay jittable and
dryrun_multichip must keep compiling+running the full distributed step on a
virtual mesh (the driver gates rounds on both)."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_entry_jits_and_steps():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert int(np.asarray(out.state.valid().sum())) == 8192
    assert np.isfinite(np.asarray(out.state.vel)).all()


@pytest.mark.slow
def test_dryrun_multichip_smoke():
    import __graft_entry__ as g

    g.dryrun_multichip(4)
