"""Driver-contract tests: dryrun_multichip must compile + run the full DP KD
train step over a virtual 8-device mesh."""

import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import jax
    import __graft_entry__ as ge

    fn, args = ge.entry()
    preds, proj = jax.jit(fn)(*args)
    assert preds.shape == (8, 3)
    assert proj.shape[0] == 8
