"""Multi-host data parallelism: 2 real processes, local-coordinator
``jax.distributed`` bring-up, 8-device global mesh (4 virtual CPU devices per
process), one GAN train step where each process contributes only its local
half of the global batch via ``shard_batch``'s
``make_array_from_process_local_data`` branch (rnagan_tpu/parallel/mesh.py:107-114,
SURVEY.md section 5.8 — a new-framework component with no reference
counterpart)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_data_parallel_gan_step():
    port = _free_port()
    child = os.path.join(os.path.dirname(__file__), "_multihost_child.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(child))] + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = [subprocess.Popen([sys.executable, child, str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    if any("SKIP:" in o for o in outs):
        pytest.skip("cpu collectives unavailable: " + outs[0].splitlines()[-1])
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"

    lines = [next(l for l in o.splitlines() if l.startswith("METRICS")) for o in outs]
    # SPMD: both processes computed the same global step -> identical metrics
    assert lines[0] == lines[1], f"{lines[0]!r} != {lines[1]!r}"
    d_loss = float(lines[0].split("d_loss=")[1].split()[0])
    assert abs(d_loss) < 100.0
