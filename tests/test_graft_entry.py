"""Driver contract tests: entry() compiles single-chip; dryrun_multichip
runs the full sharded training step on a virtual mesh."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[1].shape


def test_dryrun_multichip_4():
    import __graft_entry__ as g

    g.dryrun_multichip(4)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
