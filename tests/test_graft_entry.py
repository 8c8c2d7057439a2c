"""Pin the driver contract: entry() compiles; dryrun_multichip runs."""

import sys

import jax
import numpy as np

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    inter, weighted = out
    assert inter.shape == (8, 4)
    assert weighted.shape == (8, 4)
    assert int(np.asarray(inter).min()) >= 0


def test_dryrun_multichip_virtual_mesh():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
