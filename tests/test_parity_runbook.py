"""Slow-tier smoke of the real-weights parity runbook (tools/parity_real.py).

Runs the full --standins flow in a subprocess: synthesized weights/ckpt/
MOT sequence/COCO list through per-layer diff, ckpt load, mAP machinery
and MOT eval, asserting the runbook reports ok with zero failures. This
is the offline proof that the one-command real-weights flow (VERDICT
round-2 item 7) is executable the moment real files exist.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_parity_runbook_standins(tmp_path):
    out = tmp_path / "PARITY_STANDIN.md"
    from conftest import cpu_subprocess_env
    env = cpu_subprocess_env()
    r = subprocess.run(
        [sys.executable, "tools/parity_real.py", "--standins",
         "--out", str(out)],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=2400,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rec = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert rec["ok"] is True and rec["failures"] == []
    text = out.read_text()
    assert "STAND-IN" in text  # honesty marker
    assert "per-layer oracle diff" in text and "OK" in text
    assert "MOTA" in text
