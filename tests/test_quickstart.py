"""The quickstart example must stay runnable end-to-end."""

import os
import subprocess
import sys


def test_quickstart_runs():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "examples", "quickstart.py")],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "done" in out.stdout
