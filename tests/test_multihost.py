"""Multi-host (multi-process) data-parallel training tests.

The real thing, not a simulation: two OS processes with two virtual CPU
devices each join a jax.distributed runtime (Gloo collectives — the CPU
stand-in for DCN), shard the scene list with shard_for_hosts, feed
per-host shards via jax.make_array_from_process_local_data, and run the
full train_and_get_best_model loop. Numerics must match a 4-device
single-controller run of the same deterministic config (the global batch
is a permutation of the single-controller batch; every objective here is
permutation-invariant).

Single-process unit tests for the feeding/replication helpers live in
test_parallel.py.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "tests", "_multihost_driver.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(n_devices: int, extra=None):
    env = dict(os.environ)
    env.pop("HRN_DISTRIBUTED", None)
    env.pop("HRN_COORDINATOR", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    if extra:
        env.update(extra)
    return env


@pytest.fixture(scope="module")
def mh_root(tmp_path_factory):
    from highresnet_tpu.data.synth import make_synthetic_dataset

    root = tmp_path_factory.mktemp("mh")
    # 8 scenes -> split 5 train / 3 val at val_proportion=0.34; with
    # global batch 4 + drop_last both layouts train on scenes [0..3]
    # (single-controller: one batch [s0,s1,s2,s3]; two hosts: [s0,s2] +
    # [s1,s3] -> the same set, permuted)
    make_synthetic_dataset(
        str(root), n_scenes_per_channel=4, n_views=5, lr_size=24, seed=0, splits=("train",)
    )
    return str(root)


@pytest.mark.slow
def test_two_process_training_matches_single_controller(mh_root, tmp_path):
    """2-process x 2-device distributed loop == 4-device single-controller
    loop, epoch for epoch, and both processes agree on the outcome."""
    port = _free_port()
    outs = {k: str(tmp_path / f"{k}.json") for k in ("single", "p0", "p1")}

    single = subprocess.Popen(
        [sys.executable, DRIVER, "single", mh_root, outs["single"]],
        env=_env(4), cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    procs = []
    for pid in (0, 1):
        env = _env(
            2,
            {
                "HRN_COORDINATOR": f"localhost:{port}",
                "HRN_NUM_PROCESSES": "2",
                "HRN_PROCESS_ID": str(pid),
            },
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, DRIVER, "multi", mh_root, outs[f"p{pid}"]],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )

    logs = {}
    logs["single"] = single.communicate(timeout=900)[0]
    assert single.returncode == 0, logs["single"][-3000:]
    for pid, p in enumerate(procs):
        logs[f"p{pid}"] = p.communicate(timeout=900)[0]
        assert p.returncode == 0, logs[f"p{pid}"][-3000:]

    res = {k: json.load(open(v)) for k, v in outs.items()}

    assert res["single"]["process_count"] == 1
    assert res["single"]["device_count"] == 4
    for pid in (0, 1):
        assert res[f"p{pid}"]["process_count"] == 2
        assert res[f"p{pid}"]["device_count"] == 4

    # both processes computed identical (replicated) outcomes
    assert res["p0"]["best_score"] == pytest.approx(res["p1"]["best_score"], rel=1e-12)

    # distributed == single-controller, per epoch (and training actually
    # ran: a drop_last/short-shard regression would yield loss == 0.0)
    assert res["single"]["losses"][0] != 0.0
    assert len(res["single"]["losses"]) == 2
    assert len(res["p0"]["losses"]) == 2  # process 1 logs nothing (primary-only)
    assert res["p1"]["losses"] == []
    np.testing.assert_allclose(res["p0"]["losses"], res["single"]["losses"], rtol=1e-5)
    np.testing.assert_allclose(res["p0"]["vals"], res["single"]["vals"], rtol=1e-5)
    assert res["p0"]["best_score"] == pytest.approx(res["single"]["best_score"], rel=1e-5)

    # only process 0 wrote checkpoints
    run_multi = res["p0"]["run_dir"]
    assert os.path.isdir(os.path.join(run_multi, "best"))
