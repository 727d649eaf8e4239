"""Driver-contract regression: entry() traces, dryrun_multichip(8) runs."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    shapes = jax.eval_shape(fn, *args)  # full trace, no compute
    refined, flow = shapes
    assert refined.shape == (32768, 3)
    assert flow.shape == (32768, 3)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
