"""Driver entry points must keep compiling: single-chip forward step and
the multi-chip dry run on the faked 8-device mesh."""

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    scores, idx = jax.jit(fn)(*args)
    assert scores.shape == (64, 10)
    assert idx.shape == (64, 10)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
