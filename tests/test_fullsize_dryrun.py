"""Production-dim multichip dryrun (VERDICT r3 missing item 2; the env
gate was dropped in round 5 per VERDICT r4 task 6 so `pytest -m slow`
CAN reach it).

Runs `dryrun_multichip(8, full_size=True)` — the FULL flagship training
step (ViT-B/16 @ 224px, roberta-base dims, 4096-wide projections, the
50265-wide MLM vocab decoder sharded on 'model') jitted over an 8-device
data(4) x model(2) virtual CPU mesh and executed for one step.

`slow`-marked: the full-size CPU compile takes tens of minutes cold on a
1-core host (the persistent compile cache makes repeats cheap). The
driver / chip queues also invoke it directly, once per round:

    python __graft_entry__.py 8 --full-size
"""

import pytest

pytestmark = [pytest.mark.slow]


def test_fullsize_multichip_dryrun():
    from __graft_entry__ import dryrun_multichip

    # self-provisions an 8-device child if this process has fewer devices
    dryrun_multichip(8, full_size=True)
