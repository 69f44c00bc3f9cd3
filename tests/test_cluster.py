"""Two-raylet cluster validation (VERDICT r4 item 1): the only place the
tasks engine's P x P ObjectRef exchange and Ray Data's block movement cross a
real raylet boundary. Runs entirely in subprocesses (its own `ray start`
head + worker on a dedicated port + temp dir, fresh driver processes), so it
never touches the pytest session's in-process local Ray.

Skipped by default (~2 min): run with RAYLINK_CLUSTER_TESTS=1, e.g.
  RAYLINK_CLUSTER_TESTS=1 python -m pytest tests/test_cluster.py -q
`python bench.py --cluster` runs the same validation plus a flagship timing.
"""

import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 63792
ADDR = f"127.0.0.1:{PORT}"
TMPDIR = f"/tmp/rl_cluster_test_{PORT}"

pytestmark = pytest.mark.skipif(
    not os.environ.get("RAYLINK_CLUSTER_TESTS"),
    reason="slow two-raylet cluster test; set RAYLINK_CLUSTER_TESTS=1",
)


def _env() -> dict:
    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    env["RAY_GRAFT_CPUS"] = "16"
    return env


def _validate(extra: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cluster_validate.py"),
         *extra],
        env=_env(), cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def two_raylet_cluster():
    env = _env()
    subprocess.run(["pkill", "-9", "-f", TMPDIR], capture_output=True)
    time.sleep(1.0)
    import shutil

    shutil.rmtree(TMPDIR, ignore_errors=True)
    subprocess.run(
        ["ray", "start", "--head", f"--port={PORT}", "--num-cpus=8",
         "--include-dashboard=false", "--disable-usage-stats",
         f"--temp-dir={TMPDIR}"],
        env=env, check=True, capture_output=True, text=True,
    )
    subprocess.run(
        ["ray", "start", f"--address={ADDR}", "--num-cpus=8",
         "--disable-usage-stats"],
        env=env, check=True, capture_output=True, text=True,
    )
    yield ADDR
    # kill by the unique temp-dir pattern (NOT `ray stop`, which would also
    # take down the pytest session's in-process local raylet)
    subprocess.run(["pkill", "-9", "-f", TMPDIR], capture_output=True)
    time.sleep(1.0)


def test_cluster_bit_identical_to_local(two_raylet_cluster):
    cl = _validate(["--address", two_raylet_cluster])
    assert cl["nodes"]["alive_raylets"] == 2
    assert cl["nodes"]["task_nodes_seen"] == 2, "work never left the head node"
    assert cl["resume"]["resume_bit_identical"]
    assert cl["resume"]["resume_supersteps"] == 0

    lo = _validate(["--local", "--num-cpus", "16"])
    assert cl["rows"] == lo["rows"]
    assert cl["hashes"] == lo["hashes"], (
        f"cluster/local diverged: {cl['hashes']} vs {lo['hashes']}"
    )
    assert cl["resume"]["ranks_md5"] == lo["resume"]["ranks_md5"]
