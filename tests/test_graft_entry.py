"""The driver-facing entry points must always work: single-chip forward
compile and the multichip training-step dry run."""
import numpy as np

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, (params, batch) = g.entry()
    loss = jax.jit(fn)(params, batch)
    assert np.isfinite(float(loss))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g

    g.dryrun_multichip(2)
