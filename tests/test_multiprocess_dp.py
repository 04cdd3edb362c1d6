"""True multi-process data parallelism: 2 OS processes x 2 virtual CPU
devices each, coordinated through jax.distributed (the multi-controller
analog of the reference's mp.spawn + NCCL process group,
scripts/train.py:60-118). Exercises the process-boundary paths the
single-process 8-device mesh tests cannot: coordinator rendezvous,
host-local -> global batch assembly, per-host camera-shard disjointness,
and replica-identical refinement across processes.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_train(tmp_path):
    repo = Path(__file__).resolve().parent.parent
    # dataset must exist before workers race for it
    gen = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r);"
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from pathlib import Path;"
         "from gstk_tpu.data.synthetic import generate_synthetic_dataset;"
         "generate_synthetic_dataset(Path(%r), n_points=300, n_views=10,"
         " img_wh=(48, 32))" % (str(repo), str(tmp_path / "ds"))],
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True, timeout=300,
    )
    assert gen.returncode == 0, gen.stderr[-2000:]

    port = _free_port()
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": str(repo),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(repo / "tests" / "_mp_worker.py"),
             str(pid), "2", str(port), str(tmp_path / "ds"), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"

    r0 = json.loads((tmp_path / "result_0.json").read_text())
    r1 = json.loads((tmp_path / "result_1.json").read_text())

    # per-host camera shards are disjoint and cover the train split
    s0, s1 = set(r0["shard"]), set(r1["shard"])
    assert s0 and s1
    assert not (s0 & s1), "camera shards overlap across hosts"
    assert len(s0 | s1) == len(r0["shard"]) + len(r1["shard"])

    # replicated training state identical across processes after 6 steps
    # including two refinement passes (refine_every=3)
    for k in r0["sums"]:
        assert r0["sums"][k] == pytest.approx(r1["sums"][k], rel=1e-6), k
    assert r0["sums"]["step"] == 6
