"""docs/PARITY_RUNBOOK.md stays executable: every documented CLI flag must
exist on the documented subcommand, and the documented python snippet's
imports must resolve. The heavy end-to-end drive of the same commands on a
fabricated reference-format .pth lives in tests/test_checkpoint_strict.py::
test_egomcq_zero_shot_from_reference_pth."""

import contextlib
import io
import os
import re

import pytest

RUNBOOK = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "PARITY_RUNBOOK.md")


def _documented_commands():
    """[(subcommand, {--flags})] from the runbook's ```bash blocks."""
    text = open(RUNBOOK).read()
    out = []
    for block in re.findall(r"```bash\n(.*?)```", text, re.S):
        m = re.search(r"egovlpv2-tpu\s+(\S+)", block)
        if not m:
            continue
        out.append((m.group(1), set(re.findall(r"(--[\w-]+)", block))))
    return out


def _help_text(subcmd):
    from egovlpv2_tpu import cli

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), pytest.raises(SystemExit):
        cli.main([subcmd, "--help"])
    return buf.getvalue()


def test_runbook_flags_exist():
    cmds = _documented_commands()
    assert {c for c, _ in cmds} == {"egomcq", "ft-epic"}
    for subcmd, flags in cmds:
        helptext = _help_text(subcmd)
        missing = {f for f in flags if f not in helptext}
        assert not missing, f"{subcmd}: runbook flags not in CLI: {missing}"


def test_runbook_python_snippet_imports():
    text = open(RUNBOOK).read()
    snippet = re.search(r"<<'EOF'\n(.*?)EOF", text, re.S).group(1)
    # the snippet must reference only real API names
    from egovlpv2_tpu.train import checkpoint_import

    for name in re.findall(r"checkpoint_import import \(\n?\s*([\w, ]+)\)",
                           snippet.replace("\n", " ")):
        for sym in name.split(","):
            assert hasattr(checkpoint_import, sym.strip())
    # and the config presets it names must exist
    for cfg in re.findall(r"configs/[\w.]+\.json", text):
        assert os.path.exists(os.path.join(os.path.dirname(RUNBOOK), "..",
                                           cfg)), cfg


def test_runbook_egomcq_kernel_regime():
    """The documented 16-frame EgoMCQ eval (configs/eval_egomcq.json, S =
    1 + 16*196) runs the patch-major TIME kernel by DEFAULT since round 5
    (rule-of-two confirmed: 511.4/512.7 ms vs 590.8 dense) — the parity
    path and the perf path are the same code. Guards the regime selectors
    the runbook's numbers were measured under."""
    from egovlpv2_tpu.ops import divided

    s = 1 + 16 * 196
    assert divided._time_pm("time", s, 16)
    # auto window cap: 224 at F<=16 (timepm_w224_16f 485.2 ms vs 511.4 @112)
    assert divided._pm_window(s, 16) == 224  # exact divisor of 3136
    assert divided._space_fb("space", s)     # frame-block space kernels
    # the 32-frame fine-tune shape rides the same kernel; at F=32 the
    # 224-row window LOSES (604.2 vs 573.0/586.2) so the cap stays 128
    s32 = 1 + 32 * 196
    assert divided._time_pm("time", s32, 32)
    assert divided._pm_window(s32, 32) == 128
