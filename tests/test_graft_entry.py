"""Keep the driver entry points green: entry() must eval_shape cleanly and
dryrun_multichip must run a full sharded train step on the virtual mesh."""

import sys

import jax
import pytest


sys.path.insert(0, "/root/repo")


def test_entry_shapes():
    import __graft_entry__ as g

    fn, args = g.entry()
    paf, ht = jax.eval_shape(fn, *args)
    assert paf.shape == (1, 46, 46, 38)
    assert ht.shape == (1, 46, 46, 19)


def test_dryrun_multichip_small():
    import __graft_entry__ as g

    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    g.dryrun_multichip(n)
