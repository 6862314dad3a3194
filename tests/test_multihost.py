"""Real multi-host initialization test (VERDICT r3 missing #4).

Runs ``scripts/multihost_smoke.py``: two coordinated local CPU processes
through ``parallel.mesh.initialize_multihost`` — a genuine
``jax.distributed.initialize`` handshake (child 0 serves as coordinator),
global 4-device view from 2 local devices each, ``is_primary()`` gating,
a cross-process psum over gloo collectives, and one sharded train round
over the global mesh with identical metrics on both processes.

Slow (two fresh interpreters compile the round on one host core), so not
in the smoke tier; the script is also runnable standalone.
"""

import pytest

import pathlib
import subprocess
import sys

SCRIPT = pathlib.Path(__file__).parent.parent / "scripts" / "multihost_smoke.py"


@pytest.mark.slow
def test_two_process_initialize_and_sharded_round():
    out = subprocess.run(
        [sys.executable, str(SCRIPT)],
        capture_output=True, text=True, timeout=580,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST SMOKE: PASS" in out.stdout
    # Both children asserted the global view and primary gating themselves;
    # the parent only aggregates. Check their markers surfaced.
    assert "child 0: ok" in out.stdout
    assert "child 1: ok" in out.stdout
