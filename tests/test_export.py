"""AOT serving export (seld_tpu.inference.export, scripts/export_model.py).

The reference serves Keras hdf5 through a live TF process
(evaluator.py:53-58); these pin the TPU-native replacement: params baked
into one StableHLO artifact, symbolic batch, exact roundtrip."""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.inference.export import (export_window_forward,
                                       export_clip_fast, save_exported,
                                       load_exported)
from seld_tpu.models import build_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = {
    "FIRST": "simple_conv_block",
    "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
    "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
    "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
    "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
    "n_classes": 4,
}


def _tiny_model(input_shape=(50, 16, 7)):
    model = build_model("seldnet", input_shape, TINY)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, *input_shape)), train=False)
    return model, variables


def test_window_export_symbolic_batch_roundtrip(tmp_path):
    model, variables = _tiny_model()
    exported = export_window_forward(model, variables, (50, 16, 7))
    path = save_exported(exported, str(tmp_path / "tiny.shlo"),
                         extra_meta={"unit": "window"})
    art = load_exported(path)
    assert art.meta["unit"] == "window"
    assert art.meta["jax_version"] == jax.__version__
    rng = np.random.RandomState(0)
    # ONE artifact, multiple batch sizes (symbolic dim)
    for b in (1, 3, 8):
        x = rng.randn(b, 50, 16, 7).astype(np.float32)
        got = art.call(x)
        want = model.apply(variables, jnp.asarray(x), train=False)
        for g, w in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-6, atol=1e-6)


def test_window_export_static_batch(tmp_path):
    """batch=N exports a fixed-batch artifact (the TPU Pallas-capable
    form): right batch matches the live model, wrong batch is rejected."""
    model, variables = _tiny_model()
    exported = export_window_forward(model, variables, (50, 16, 7), batch=8)
    path = save_exported(exported, str(tmp_path / "b8.shlo"))
    art = load_exported(path)
    x = np.random.RandomState(0).randn(8, 50, 16, 7).astype(np.float32)
    got = art.call(x)
    want = model.apply(variables, jnp.asarray(x), train=False)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-6)
    with pytest.raises(Exception):
        jax.block_until_ready(
            art.call(np.zeros((4, 50, 16, 7), np.float32)))


def test_window_export_needs_no_model_code(tmp_path):
    """The artifact must be loadable by raw jax.export alone — the whole
    point is serving without the model-building Python."""
    model, variables = _tiny_model()
    path = save_exported(export_window_forward(model, variables, (50, 16, 7)),
                         str(tmp_path / "tiny.shlo"))
    from jax import export as jexport
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    out = jax.jit(exported.call)(np.zeros((2, 50, 16, 7), np.float32))
    assert jax.tree_util.tree_leaves(out)[0].shape == (2, 10, 4)


def test_clip_export_matches_fast_path(tmp_path):
    from seld_tpu.config import get_model_config
    from seld_tpu.inference.ensemble import _predict_clip_fast

    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    model = build_model("conv_temporal", (50, 16, 7), cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 50, 16, 7)), train=False)
    exported = export_clip_fast(model, variables, 200, (50, 16, 7),
                                win_size=50, step_size=5, time_down=5)
    path = save_exported(exported, str(tmp_path / "clip.shlo"),
                         extra_meta={"unit": "clip"})
    art = load_exported(path)
    x = np.random.RandomState(1).randn(200, 16, 7).astype(np.float32)
    got = art.call(x)
    want = _predict_clip_fast(variables, jnp.asarray(x),
                              apply_fn=model.apply, win_size=50,
                              step_size=5, batch_size=1 << 30, time_down=5)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_window_ensemble_export_matches_average(tmp_path):
    """N-model ensemble in ONE artifact: the baked average must equal the
    make_answer.py:133-140 semantics (mean of member outputs, f32), with
    the symbolic batch dim intact — members may differ architecturally."""
    from seld_tpu.inference.export import export_window_ensemble

    model_a, var_a = _tiny_model()
    wide = dict(TINY, SECOND_ARGS={"units": [12]})
    model_b = build_model("seldnet", (50, 16, 7), wide)
    var_b = model_b.init({"params": jax.random.PRNGKey(7)},
                         jnp.zeros((1, 50, 16, 7)), train=False)
    exported = export_window_ensemble(
        [(model_a.apply, var_a), (model_b.apply, var_b)], (50, 16, 7))
    path = save_exported(exported, str(tmp_path / "ens.shlo"),
                         extra_meta={"unit": "window", "n_members": 2})
    art = load_exported(path)
    assert art.meta["n_members"] == 2
    rng = np.random.RandomState(0)
    for b in (1, 5):
        x = rng.randn(b, 50, 16, 7).astype(np.float32)
        got = art.call(x)
        outs = [m.apply(v, jnp.asarray(x), train=False)
                for m, v in ((model_a, var_a), (model_b, var_b))]
        for i, g in enumerate(got):
            want = (np.asarray(outs[0][i], np.float32)
                    + np.asarray(outs[1][i], np.float32)) / 2
            np.testing.assert_allclose(np.asarray(g), want,
                                       rtol=1e-6, atol=1e-6)


@pytest.mark.heavy
def test_clip_ensemble_export_matches_average(tmp_path):
    """Whole make_answer ensemble journey in one dispatch: trunk-once fast
    sliding window per member + overlap-add + model average, all inside
    the artifact."""
    from seld_tpu.config import get_model_config
    from seld_tpu.inference.ensemble import (_predict_clip_fast,
                                             average_ensemble)
    from seld_tpu.inference.export import export_clip_fast_ensemble

    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    model = build_model("conv_temporal", (50, 16, 7), cfg)
    members = []
    for seed in (0, 3):
        v = model.init({"params": jax.random.PRNGKey(seed)},
                       jnp.zeros((1, 50, 16, 7)), train=False)
        members.append((model.apply, v))
    exported = export_clip_fast_ensemble(
        members, 200, (50, 16, 7), win_size=50, step_size=5,
        time_downs=[5, 5])
    path = save_exported(exported, str(tmp_path / "ens_clip.shlo"),
                         extra_meta={"unit": "clip", "n_members": 2})
    art = load_exported(path)
    x = np.random.RandomState(1).randn(200, 16, 7).astype(np.float32)
    got = art.call(x)
    per_model = [[_predict_clip_fast(v, jnp.asarray(x), apply_fn=f,
                                     win_size=50, step_size=5,
                                     batch_size=1 << 30, time_down=5)]
                 for f, v in members]
    want = average_ensemble(per_model)[0]
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.heavy
def test_streaming_export_matches_live_engine(tmp_path):
    """export_streaming bundle + StreamingSELD.from_exported: the exported
    engine (no model code, no variables) must emit the same frames as the
    live engine on the same ragged pushes, and refuse short clips."""
    from seld_tpu.config import get_model_config
    from seld_tpu.inference.export import export_streaming
    from seld_tpu.inference.streaming import StreamingSELD

    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    model = build_model("conv_temporal", (50, 16, 7), cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, 50, 16, 7)), train=False)
    bundle = export_streaming(
        model.apply, variables, (16, 7), str(tmp_path / "bundle"),
        win_size=50, step_size=5, time_down=5, chunk=4)

    live = StreamingSELD(model.apply, variables, feat_shape=(16, 7),
                         win_size=50, step_size=5, time_down=5, chunk=4)
    exp = StreamingSELD.from_exported(bundle)
    assert exp.halo_t == live.halo_t and exp.l_f == live.l_f

    x = np.random.RandomState(2).randn(200, 16, 7).astype(np.float32)
    got_l, got_e = [], []
    for lo in range(0, 200, 33):
        got_l.extend(live.push(x[lo:lo + 33]))
        got_e.extend(exp.push(x[lo:lo + 33]))
    got_l.extend(live.finalize())
    got_e.extend(exp.finalize())
    assert len(got_e) == len(got_l) == 40
    for (sl, dl), (se, de) in zip(got_l, got_e):
        np.testing.assert_allclose(np.asarray(se), np.asarray(sl), atol=1e-5)
        np.testing.assert_allclose(np.asarray(de), np.asarray(dl), atol=1e-5)

    # short clips need the live model: the exported engine refuses loudly
    exp.reset()
    exp.push(x[: exp.l_f - 10])
    with pytest.raises(RuntimeError, match="exported streaming engines"):
        exp.finalize()


@pytest.mark.slow
def test_export_cli_stream_unit(tmp_path):
    """CLI: --unit stream writes a bundle dir, --verify drives exported
    vs live engines, and stream_demo --export_dir serves it."""
    from seld_tpu.config import get_model_config
    from seld_tpu.train.checkpoint import save_checkpoint
    from seld_tpu.train.train_state import TrainState
    import optax

    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    model = build_model("conv_temporal", (50, 16, 7), cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 50, 16, 7)), train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=optax.adam(1e-3), rng=jax.random.PRNGKey(0))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), "w", state)

    env = dict(os.environ, SELD_PLATFORM="cpu", PYTHONPATH=REPO)
    bundle = tmp_path / "bundle"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/export_model.py"),
         "--ckpt", ckpt, "--model_config", "SS5", "--unit", "stream",
         "--out", str(bundle), "--win_size", "50", "--n_freq", "16",
         "--chunk", "4", "--verify"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "exported stream engine matches the live engine" in r.stdout
    assert (bundle / "meta.json").exists()
    for part in ("bootstrap", "step", "finalize"):
        assert (bundle / f"{part}.shlo").exists()

    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/stream_demo.py"),
         "--export_dir", str(bundle), "--chunk", "4",
         "--seconds", "4", "--reps", "1"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r2.returncode == 0, (r2.stdout[-2000:], r2.stderr[-2000:])
    assert "40/40 frames" in r2.stdout


@pytest.mark.slow
def test_export_cli_roundtrip(tmp_path):
    """CLI journey: save a checkpoint -> export --verify -> load + call."""
    from seld_tpu.train.checkpoint import save_checkpoint
    from seld_tpu.train.train_state import TrainState
    import optax

    model, variables = _tiny_model()
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=optax.adam(1e-3), rng=jax.random.PRNGKey(0))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), "weights", state)

    import json
    mc = dict(TINY)
    mc.pop("n_classes")
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(mc))

    env = dict(os.environ, SELD_PLATFORM="cpu", PYTHONPATH=REPO)
    out = tmp_path / "art.shlo"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/export_model.py"),
         "--ckpt", ckpt, "--model", "seldnet",
         "--model_config", str(cfg_path), "--out", str(out),
         "--n_classes", "4", "--win_size", "50", "--n_freq", "16",
         "--verify"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "verify: artifact matches the live model" in r.stdout
    art = load_exported(str(out))
    assert art.meta["model"] == "seldnet"
    out_t = art.call(np.zeros((2, 50, 16, 7), np.float32))
    assert jax.tree_util.tree_leaves(out_t)[0].shape == (2, 10, 4)


@pytest.mark.slow
def test_export_cli_ensemble(tmp_path):
    """CLI ensemble journey: two checkpoints -> one averaged artifact
    (--ckpt a,b), verified against the live member average."""
    from seld_tpu.train.checkpoint import save_checkpoint
    from seld_tpu.train.train_state import TrainState
    import optax

    model, _ = _tiny_model()
    ckpts = []
    for seed in (0, 9):
        variables = model.init({"params": jax.random.PRNGKey(seed)},
                               jnp.zeros((1, 50, 16, 7)), train=False)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            tx=optax.adam(1e-3), rng=jax.random.PRNGKey(0))
        ckpts.append(save_checkpoint(str(tmp_path / f"ckpt{seed}"),
                                     "weights", state))

    import json
    mc = dict(TINY)
    mc.pop("n_classes")
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(mc))

    env = dict(os.environ, SELD_PLATFORM="cpu", PYTHONPATH=REPO)
    out = tmp_path / "ens.shlo"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/export_model.py"),
         "--ckpt", ",".join(ckpts), "--model", "seldnet",
         "--model_config", str(cfg_path), "--out", str(out),
         "--n_classes", "4", "--win_size", "50", "--n_freq", "16",
         "--verify"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "verify: artifact matches the live model" in r.stdout
    art = load_exported(str(out))
    assert art.meta["n_members"] == 2
    out_t = art.call(np.zeros((2, 50, 16, 7), np.float32))
    leaves = jax.tree_util.tree_leaves(out_t)
    assert leaves[0].shape == (2, 10, 4)
    assert all(l.dtype == jnp.float32 for l in leaves)


@pytest.mark.heavy
def test_window_export_spmd_mesh(tmp_path):
    """mesh= exports an SPMD artifact: one dispatch spans the whole mesh
    (batch sharded over `data`), outputs match the single-device forward,
    and the artifact records/enforces its device count."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    model, variables = _tiny_model()
    mesh = Mesh(np.array(jax.devices()), ("data",))
    n = mesh.devices.size
    exported = export_window_forward(model, variables, (50, 16, 7),
                                     batch=2 * n, mesh=mesh)
    assert exported.nr_devices == n
    path = save_exported(exported, str(tmp_path / "tiny_spmd.shlo"),
                         extra_meta={"unit": "window"})
    art = load_exported(path)
    assert art.meta["nr_devices"] == n

    s = NamedSharding(mesh, P("data"))
    x = np.random.RandomState(0).randn(2 * n, 50, 16, 7).astype(np.float32)
    got = art.call(jax.device_put(x, s))
    assert got[0].sharding.is_equivalent_to(s, got[0].ndim)
    want = model.apply(variables, jnp.asarray(x), train=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)

    # guard rails: device-count mismatch is refused loudly, and SPMD
    # export demands a static, mesh-divisible batch
    with pytest.raises(ValueError, match="devices"):
        jax.jit(art.exported.call)(x)          # 1-device calling context
    with pytest.raises(ValueError, match="static batch"):
        export_window_forward(model, variables, (50, 16, 7), mesh=mesh)
    with pytest.raises(ValueError, match="divide"):
        export_window_forward(model, variables, (50, 16, 7),
                              batch=n + 1, mesh=mesh)


@pytest.mark.slow
def test_export_cli_data_parallel(tmp_path):
    """CLI SPMD journey: --data_parallel 8 --batch 16 exports a mesh-sharded
    window artifact, --verify passes in-process, and the loaded artifact
    answers a device_put global batch."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from seld_tpu.train.checkpoint import save_checkpoint
    from seld_tpu.train.train_state import TrainState
    import optax

    model, variables = _tiny_model()
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=optax.adam(1e-3), rng=jax.random.PRNGKey(0))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), "weights", state)

    import json
    mc = dict(TINY)
    mc.pop("n_classes")
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(mc))

    env = dict(os.environ, SELD_PLATFORM="cpu", PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = tmp_path / "art_dp.shlo"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/export_model.py"),
         "--ckpt", ckpt, "--model", "seldnet",
         "--model_config", str(cfg_path), "--out", str(out),
         "--n_classes", "4", "--win_size", "50", "--n_freq", "16",
         "--batch", "16", "--data_parallel", "8", "--verify"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "verify: artifact matches the live model" in r.stdout

    art = load_exported(str(out))
    assert art.meta["nr_devices"] == 8
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    x = np.random.RandomState(0).randn(16, 50, 16, 7).astype(np.float32)
    got = art.call(jax.device_put(x, NamedSharding(mesh, P("data"))))
    want = model.apply(variables, jnp.asarray(x), train=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_export_cli_data_parallel_refused_off_window(tmp_path):
    """--data_parallel with --unit clip/stream exits loudly instead of
    silently writing a single-device artifact (the flag only exists for
    the window unit's batch axis)."""
    env = dict(os.environ, SELD_PLATFORM="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/export_model.py"),
         "--ckpt", str(tmp_path / "nonexistent"), "--model_config", "SS5",
         "--unit", "clip", "--data_parallel", "8",
         "--out", str(tmp_path / "x.shlo")],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode != 0
    assert "--data_parallel is a window-unit option" in r.stderr + r.stdout
    assert not (tmp_path / "x.shlo").exists()
