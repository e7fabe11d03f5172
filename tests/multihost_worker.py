"""Worker process for the 2-process multi-host (DCN) tests.

Run by tests/test_multihost.py:
    python tests/multihost_worker.py <port> <process_id> <outdir> [mode]

Two processes x 4 virtual CPU devices = one 8-device global data mesh over
gloo collectives. Modes:

base     (default) each process loads its stride of the dataset
         (SeldDataset(process_index=...), the data_loader-equivalent DCN
         split, SURVEY §5), trains a tiny seldnet for 3 data-parallel
         steps, verifies the replicated params agree across hosts, and
         saves an orbax checkpoint for the parent's cross-topology restore.
uneven   global window count (47) NOT divisible by the host count: local
         slices are 24 vs 23 windows. The per-epoch step count must derive
         from the GLOBAL count (both hosts run exactly 2 steps) — a host
         iterating its longer local slice one extra step would hang the
         other at the next collective. Trains a full epoch by iterating
         the dataset to exhaustion (not a fixed step count), so a step-
         count mismatch would deadlock this very test.
resume_a mid-epoch kill point: trains 2 steps, saves the full training
         state (params + optimizer slots + rng) and per-step losses.
resume_b process restart: restores resume_a's checkpoint into the
         2-process mesh, trains 1 more step, writes losses — the parent
         asserts both hosts restored identically and kept agreeing.
"""
import json
import os
import sys

port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "base"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{port}", 2, pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seld_tpu.data.loader import DeviceIterator, SeldDataset  # noqa: E402
from seld_tpu.models import build_model  # noqa: E402
from seld_tpu.parallel import make_mesh  # noqa: E402
from seld_tpu.parallel.mesh import batch_sharding, replicate  # noqa: E402
from seld_tpu.train import losses as L  # noqa: E402
from seld_tpu.train import metrics as M  # noqa: E402
from seld_tpu.train.checkpoint import (restore_checkpoint,  # noqa: E402
                                       save_checkpoint)
from seld_tpu.train.steps import make_train_step  # noqa: E402
from seld_tpu.train.train_state import TrainState  # noqa: E402

assert jax.process_count() == 2
assert len(jax.devices()) == 8

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
variables = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((2, 20, 16, 7)), train=False)

mesh = make_mesh("data:-1")
tx = optax.adam(1e-3)


def to_host(tree):
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a.addressable_data(0)), tree)


def host_template():
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx,
        rng=jax.random.PRNGKey(1))


def shard_state(host_state):
    st = host_state.replace(
        params=replicate(host_state.params, mesh),
        batch_stats=replicate(host_state.batch_stats, mesh))
    return st.replace(opt_state=replicate(st.opt_state, mesh),
                      step=replicate(st.step, mesh),
                      rng=replicate(st.rng, mesh))


if mode == "resume_b":
    state = shard_state(restore_checkpoint(
        os.path.join(outdir, "mh_resume"), host_template())[0])
else:
    state = shard_state(host_template())

# both processes build the identical global dataset, then keep their stride
rng = np.random.RandomState(0)
B = 16  # global batch -> 8 windows per process -> 2 per device
n_global = 47 if mode == "uneven" else 64
x_all = rng.randn(n_global, 20, 16, 7).astype(np.float32)
sed = (rng.rand(n_global, 4, n_classes) < 0.3).astype(np.float32)
doa = (np.clip(rng.randn(n_global, 4, 3 * n_classes), -1, 1)
       * np.repeat(sed, 3, -1))
y_all = np.concatenate([sed, doa], axis=-1)
ds = SeldDataset(x_all, y_all, batch_size=B // 2, train=True,
                 process_index=pid, process_count=2)

step = make_train_step(
    sed_loss_fn=lambda y, p: L.sed_loss_with_weights(y, p),
    doa_loss_fn=L.MSE, loss_weights=(1.0, 10.0),
    metric_block_size=2, donate=False)

mstate = jax.tree_util.tree_map(
    lambda a: replicate(a, mesh), M.init_state(n_classes))
losses = []

if mode == "uneven":
    # local slices: 24 (proc 0) vs 23 (proc 1); the GLOBAL-derived step
    # count must agree or the epoch deadlocks right here
    assert ds.x.shape[0] == (24 if pid == 0 else 23), ds.x.shape
    assert len(ds) == 2, len(ds)
    for xb, yb in DeviceIterator(ds, sharding=batch_sharding(mesh)):
        state, mstate, (sl, dl) = step(
            state, mstate, xb, (yb[..., :n_classes], yb[..., n_classes:]))
        losses.append(float(sl) + 10.0 * float(dl))
    assert len(losses) == 2, losses
else:
    n_steps = {"base": 3, "resume_a": 2, "resume_b": 1}[mode]
    it = iter(DeviceIterator(ds, sharding=batch_sharding(mesh)))
    for _ in range(n_steps):
        xb, yb = next(it)
        state, mstate, (sl, dl) = step(
            state, mstate, xb, (yb[..., :n_classes], yb[..., n_classes:]))
        losses.append(float(sl) + 10.0 * float(dl))

# replicated params must be identical on every host after psum'd updates;
# each host reads its local copy of the replicated value
params_host = to_host(state.params)
checksum = float(sum(np.abs(p).sum() for p in
                     jax.tree_util.tree_leaves(params_host)))

# orbax save is a collective (sync_global_processes barrier): every process
# participates; the primary host writes. Leaves must be numpy (orbax rejects
# host-local SingleDeviceSharding jax.Arrays in multi-host settings).
if mode == "base":
    host_state = TrainState.create(
        apply_fn=model.apply, params=params_host,
        batch_stats=to_host(state.batch_stats),
        tx=tx, rng=jax.random.PRNGKey(1))
    host_state = jax.tree_util.tree_map(np.asarray, host_state)
    save_checkpoint(outdir, "mh_ckpt", host_state)
elif mode == "resume_a":
    # the FULL training state (optimizer slots included) so the restarted
    # processes continue the same trajectory
    host_state = jax.tree_util.tree_map(np.asarray, to_host(state))
    save_checkpoint(outdir, "mh_resume", host_state)

with open(os.path.join(outdir, f"result_{mode}_{pid}.json"), "w") as f:
    json.dump({"losses": losses, "checksum": checksum,
               "n_local_windows": int(ds.x.shape[0])}, f)
print(f"proc {pid} [{mode}] ok: losses={losses} checksum={checksum:.6f}")
