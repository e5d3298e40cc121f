"""Every committed example must run end-to-end (subprocesses: examples
own their backend selection and may assert their own oracles)."""
import glob
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("ABIP_TEST_EXAMPLES"),
    reason="examples take minutes; set ABIP_TEST_EXAMPLES=1 to run")

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, "examples", "*.py")))


@pytest.mark.parametrize("path", EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(path):
    env = dict(os.environ, ABIP_CPU="1")
    r = subprocess.run([sys.executable, path], capture_output=True,
                       text=True, cwd=REPO, timeout=420, env=env)
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-800:])
