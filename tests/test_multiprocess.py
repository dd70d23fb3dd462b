"""2-process jax.distributed DCN path (round-2 verdict #6): the script
spawns two OS processes that form a global mesh via
``parallel.multihost.init_distributed``, shard the tiny model tp=4 ACROSS
the process boundary (Gloo collectives standing in for DCN), and
byte-match a single-process generate."""

import os
import subprocess
import sys


def test_two_process_distributed_generate_matches():
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "multiproc_dcn_test.py")
    env = dict(os.environ)
    # the script manages its own backend/device-count configuration
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, script], capture_output=True,
                       text=True, timeout=600, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "MATCH" in r.stdout and "MISMATCH" not in r.stdout
