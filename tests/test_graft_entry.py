"""
Driver entry points stay healthy: entry() compiles and runs, and
dryrun_multichip executes one sharded training step on the 8-device
CPU mesh.
"""

import sys


def test_entry_runs():
    sys.path.insert(0, ".")
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = fn(*args)
    assert out.shape == (128, 128)
    assert float(abs(out).max()) > 0


def test_dryrun_multichip():
    sys.path.insert(0, ".")
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
