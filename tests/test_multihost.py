"""Multi-process (multi-host) rehearsal: two OS processes, 4 virtual CPU
devices each, joined by jax.distributed into one 8-device slice; the
sharded fused TONES->DIRECT chain runs across both and every process
checks its addressable output shards against the float64 oracle.

(The reference is strictly single-node — SURVEY.md section 2.4; this is
the jax.distributed path a real pod-slice deployment uses.)
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "multihost_rehearsal.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_chain_matches_golden():
    # no pytest-timeout in this image; the communicate(timeout=240) below
    # is the real watchdog
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # script sets its own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, SCRIPT, "--coordinator", f"localhost:{port}",
         "--num_processes", "2", "--process_id", str(i)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-2000:]}"
        assert '"ok": true' in out, out[-2000:]
        # phase 2: dual-channel config-5 measurement through the public
        # API over the two-process mesh, global stream gathered per host
        assert '"config5_ok": true' in out, out[-2000:]
        # phase 3: sharded TONES / NOISE-decim / CHIRP families, golden-
        # checked shard-by-shard on both hosts
        assert '"phase3_ok": true' in out, out[-2000:]
        # phase 4: mixed wave types (DIRECT + CHIRP on one RX) under the
        # cross-process mesh
        assert '"phase4_ok": true' in out, out[-2000:]
