"""Multi-chip dry run on the 8-virtual-device CPU mesh."""

import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    assert out.shape == (8, 14, 3)
