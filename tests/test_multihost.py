"""Multi-host (DCN) data-parallel certification (round-4 VERDICT item 3).

Two subprocesses × 4 virtual CPU devices each join one 8-device global mesh
via ``jax.distributed.initialize`` (Gloo collectives standing in for DCN).
Each process holds only ITS row-slice of the ray tables
(``parallel/distributed.shard_table_rows``); params are globally replicated;
the UNMODIFIED train step runs on the global mesh. Gate: both processes
report the same per-step metrics as the single-process 8-device run on the
equivalent global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "scripts", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def two_process_metrics(tmp_path_factory):
    d = tmp_path_factory.mktemp("multihost")
    port = _free_port()
    outs = [str(d / f"proc{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [json.load(open(o)) for o in outs]


def test_two_processes_join_one_global_mesh(two_process_metrics):
    for rep in two_process_metrics:
        assert rep["global_devices"] == 8
        assert rep["local_devices"] == 4


def test_processes_agree_with_each_other(two_process_metrics):
    a, b = two_process_metrics
    assert [m.keys() for m in a["metrics"]] == [m.keys() for m in b["metrics"]]
    for ma, mb in zip(a["metrics"], b["metrics"]):
        for k in ma:
            np.testing.assert_allclose(ma[k], mb[k], rtol=1e-6, atol=1e-8,
                                       err_msg=k)


def test_multihost_matches_single_process(two_process_metrics):
    """The 2×4 run must reproduce the single-process 8-device step metrics:
    same global table (row-sharded vs host-sliced+stitched), same replicated
    params, same key => same batch, same math up to reduction order."""
    import importlib.util

    import jax

    spec = importlib.util.spec_from_file_location("multihost_worker", WORKER)
    worker = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(worker)

    from depth_lidar_nerf_tpu.parallel.mesh import make_mesh
    mesh = make_mesh([8], jax.devices())
    single = worker.run_steps(mesh)

    for ms, m2 in zip(single, two_process_metrics[0]["metrics"]):
        for k in ms:
            np.testing.assert_allclose(ms[k], m2[k], rtol=1e-4, atol=1e-6,
                                       err_msg=k)


def test_depth_loss_present(two_process_metrics):
    # the certified step carries the depth leg (a second sharded table)
    assert "depth_loss" in two_process_metrics[0]["metrics"][0]


DRIVER_SNIPPET = """
import sys, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid, port, scene, basedir = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
from depth_lidar_nerf_tpu.parallel.distributed import init_distributed
init_distributed(f"localhost:{port}", num_processes=2, process_id=int(pid))
from depth_lidar_nerf_tpu.train.config import TrainConfig
from depth_lidar_nerf_tpu.train.loop import train
cfg = TrainConfig(
    expname="mh", basedir=basedir, datadir=scene, dataset_type="llff",
    factor=0, llffhold=0, test_scene=[2], N_rand=64, N_samples=8,
    N_importance=8, netdepth=2, netwidth=32, netdepth_fine=2,
    netwidth_fine=32, no_ndc=True, N_iters=8, i_print=4, i_weights=8,
    i_testset=0, i_video=0, i_img=0, multires=4, multires_views=2,
    should_seed=True, colmap_depth=True, depth_loss=True,
    use_fused_mlp=False)
hist = []
state = train(cfg, metrics_hook=lambda i, m: hist.append((i, m["loss"])))
assert int(state.step) == 8
print("MHOK", json.dumps(hist))
"""


def test_full_driver_two_process_train(tmp_path):
    """The WHOLE training driver (loop.train) under 2-process multihost:
    scene load on both hosts, per-process table sharding, replicated state,
    proc-0-only checkpointing — both processes must finish 8 iters and
    report identical loss trajectories."""
    from depth_lidar_nerf_tpu.data.synthetic import make_scene

    scene = tmp_path / "scene"
    make_scene(str(scene), n_images=3, H=20, W=24, focal=22.0,
               n_depth_points=80)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", DRIVER_SNIPPET, str(i), str(port),
             str(scene), str(tmp_path / f"logs{i}")],
            env=env, cwd=str(tmp_path), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"driver failed:\n{out[-4000:]}"
    hists = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("MHOK")][0]
        hists.append(json.loads(line[len("MHOK "):]))
    assert hists[0] == hists[1]
    assert len(hists[0]) == 2  # i_print=4 over 8 iters
    # proc 0 checkpoints; proc 1 does not
    assert os.path.isdir(tmp_path / "logs0" / "mh" / "checkpoints")
