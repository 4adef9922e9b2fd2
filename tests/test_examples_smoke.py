"""Example scripts are the binding tests (SURVEY §4: the reference's 31
test_*.py are its de-facto integration suite) — run two cheap ones end to
end in a subprocess at smoke scale."""
import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")


@pytest.mark.parametrize("script,tag", [
    ("test_RigidFall.py", "RigidFall"),
    ("test_MassRope.py", "MassRope"),
])
def test_example_runs(script, tag):
    env = dict(os.environ, EXAMPLE_FRAMES="4", EXAMPLE_SCREEN="96")
    # inherit the current platform setup (axon or plain CPU) — examples
    # must work in both
    out = subprocess.run(
        [sys.executable, script], cwd=EXAMPLES, env=env,
        capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"{tag}: " in out.stdout and "ok=True" in out.stdout, out.stdout
