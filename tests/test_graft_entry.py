"""Driver entry points stay green: the multi-chip dryrun (train + serving on
a dp x sp x tp mesh) must keep compiling and executing on the 8 virtual CPU
devices, since the driver validates multi-chip behavior through it."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "train OK" in out and "serve OK" in out
