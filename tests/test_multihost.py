"""Multi-host (DCN) data parallelism: 2 jax.distributed CPU processes over
gloo collectives — process-strided loading, sharded global batches, psum'd
updates agreeing across hosts, and a cross-topology checkpoint restore
(saved by the 2-process run, restored single-process on an 8-device mesh).
Exercises the paths that data_loader-equivalent multi-host training uses
(SURVEY §5 'DCN-ready data loading split by jax.process_index()')."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_pair(port, tmp_path, mode, timeout=900):
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(pid), str(tmp_path), mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker[{mode}] failed:\n{out}\n{err[-3000:]}"
    results = []
    for pid in (0, 1):
        with open(tmp_path / f"result_{mode}_{pid}.json") as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
def test_two_process_data_parallel_and_cross_topology_restore(tmp_path):
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)
    results = _run_pair(port, tmp_path, "base")

    # strided loading: each host kept half the windows
    assert results[0]["n_local_windows"] == results[1]["n_local_windows"] == 32
    # data-parallel losses and the replicated params agree across hosts
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)
    np.testing.assert_allclose(results[0]["checksum"],
                               results[1]["checksum"], rtol=1e-6)
    assert all(np.isfinite(results[0]["losses"]))

    # cross-topology restore: the 2-process checkpoint loads on this
    # process's single-host 8-device mesh and evaluates
    import jax
    import jax.numpy as jnp
    import optax
    from seld_tpu.models import build_model
    from seld_tpu.train.checkpoint import restore_checkpoint
    from seld_tpu.train.train_state import TrainState

    n_classes = 4
    cfg = {
        "FIRST": "simple_conv_block",
        "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
        "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
        "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
        "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        "n_classes": n_classes,
    }
    model = build_model("seldnet", (20, 16, 7), cfg)
    variables = model.init({"params": jax.random.PRNGKey(9)},
                           jnp.zeros((2, 20, 16, 7)), train=False)
    template = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=optax.adam(1e-3), rng=jax.random.PRNGKey(1))
    restored, _, _ = restore_checkpoint(str(tmp_path / "mh_ckpt"), template)

    checksum = float(sum(np.abs(np.asarray(p)).sum() for p in
                         jax.tree_util.tree_leaves(restored.params)))
    np.testing.assert_allclose(checksum, results[0]["checksum"], rtol=1e-6)

    sed_p, doa_p = model.apply(restored.variables,
                               jnp.zeros((2, 20, 16, 7)), train=False)
    assert np.isfinite(np.asarray(sed_p)).all()
    assert sed_p.shape == (2, 4, n_classes)


@pytest.mark.slow
def test_uneven_shard_counts_do_not_deadlock(tmp_path):
    """Global window count (47) not divisible by the host count: local
    slices are 24 vs 23, but the per-epoch step count derives from the
    GLOBAL count so both hosts run exactly 2 steps. Before that fix a host
    iterating its longer local slice ran a 3rd step and hung the other at
    the collective — the worker iterates to dataset exhaustion, so a
    regression deadlocks (and times out) this test."""
    results = _run_pair(_free_port(), tmp_path, "uneven", timeout=600)
    assert results[0]["n_local_windows"] == 24
    assert results[1]["n_local_windows"] == 23
    assert len(results[0]["losses"]) == len(results[1]["losses"]) == 2
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)
    np.testing.assert_allclose(results[0]["checksum"],
                               results[1]["checksum"], rtol=1e-6)


@pytest.mark.slow
def test_mid_epoch_process_restart_and_restore(tmp_path):
    """Kill-and-restart across the process group: phase A trains 2 steps
    and checkpoints the FULL training state (optimizer slots included);
    phase B is a fresh jax.distributed process pair that restores it and
    continues — both hosts must restore identically and keep agreeing
    after the continued step."""
    a = _run_pair(_free_port(), tmp_path, "resume_a")
    np.testing.assert_allclose(a[0]["checksum"], a[1]["checksum"], rtol=1e-6)

    b = _run_pair(_free_port(), tmp_path, "resume_b")
    assert len(b[0]["losses"]) == 1
    np.testing.assert_allclose(b[0]["losses"], b[1]["losses"], rtol=1e-6)
    np.testing.assert_allclose(b[0]["checksum"], b[1]["checksum"], rtol=1e-6)
    # the continued step actually moved the params off the checkpoint
    assert abs(b[0]["checksum"] - a[0]["checksum"]) > 1e-9
