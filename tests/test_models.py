"""Model-builder tests: every zoo config builds, runs forward, and yields
the right head geometry (reference models_test.py left these as
NotImplemented stubs — fixed here)."""
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from `make test-fast`
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.config import get_model_config
from seld_tpu.models import build_model


def _forward(model, x, train=False):
    # jitted init/apply: one (persistently cached) compile instead of
    # hundreds of eager per-op dispatches — the suite is single-CPU
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = jax.jit(model.init, static_argnames=("train",))(
        rngs, x, train=False)
    if train:
        out, _ = jax.jit(model.apply, static_argnames=("train", "mutable"))(
            variables, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=("batch_stats",))
    else:
        out = jax.jit(model.apply, static_argnames=("train",))(
            variables, x, train=False)
    return out, variables


# (model, config, n_classes, time_frames): the flagship configs run the full
# 300-frame geometry; the legacy families run 100 frames (the 300/60 5x
# multiplier is preserved — same pooling path, 5x less single-CPU compile)
ZOO_SELD = [
    ("seldnet", "seldnet", 14, 300),
    ("seldnet_v1", "seldnet_v1", 14, 300),
    ("conv_temporal", "SS5", 12, 300),
    ("seldnet", "dense_gru", 14, 100),
    ("seldnet", "resnet_gru", 14, 100),
    ("seldnet", "resnet50_gru", 14, 100),
    ("seldnet", "xception_gru", 14, 100),
    ("seldnet", "Condseldnet", 14, 100),
    ("conv_temporal", "conv_temp", 14, 100),
]


@pytest.mark.parametrize("model_name,config_name,n_classes,t", ZOO_SELD)
def test_seld_models_forward(model_name, config_name, n_classes, t):
    cfg = get_model_config(config_name, search_paths=[])
    # resnet_gru.json has BLOCK keys at top level -> conv_temporal-style body
    if config_name == "resnet_gru":
        model_name = "conv_temporal"
        cfg.setdefault("first_pool_size", [5, 1])
    model = build_model(model_name, (t, 64, 7), cfg)
    x = jnp.zeros((2, t, 64, 7))
    (sed, doa), variables = _forward(model, x)
    t_l = t // 5
    assert sed.shape == (2, t_l, n_classes), f"{config_name}: sed {sed.shape}"
    assert doa.shape == (2, t_l, 3 * n_classes), \
        f"{config_name}: doa {doa.shape}"
    assert np.all(np.isfinite(np.asarray(sed)))
    assert np.all((np.asarray(sed) >= 0) & (np.asarray(sed) <= 1))
    assert np.all((np.asarray(doa) >= -1) & (np.asarray(doa) <= 1))


def test_seldnet_v1_gating_differs():
    cfg = get_model_config("seldnet", search_paths=[])
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 300, 64, 7))
    rngs = {"params": jax.random.PRNGKey(0)}

    m0 = build_model("seldnet", (300, 64, 7), cfg)
    v0 = jax.jit(m0.init, static_argnames=("train",))(rngs, x, train=False)
    sed0, doa0 = jax.jit(m0.apply, static_argnames=("train",))(
        v0, x, train=False)

    m1 = build_model("seldnet_v1", (300, 64, 7), cfg)
    sed1, doa1 = jax.jit(m1.apply, static_argnames=("train",))(
        v0, x, train=False)

    np.testing.assert_allclose(np.asarray(sed0), np.asarray(sed1), atol=1e-6)
    # gated doa = tanh(doa * tiled sed)
    expected = np.tanh(np.asarray(doa0) * np.tile(np.asarray(sed0), (1, 1, 3)))
    np.testing.assert_allclose(np.asarray(doa1), expected, atol=1e-5)


def test_vad_architecture_dense():
    cfg = {"flatten": True, "last_unit": 1,
           "BLOCK0": "simple_dense_block",
           "BLOCK0_ARGS": {"units": [32, 16], "dense_activation": "relu"}}
    model = build_model("vad_architecture", (7, 80), cfg)
    x = jnp.zeros((4, 7, 80))
    out, _ = _forward(model, x)
    assert out.shape == (4,)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_spectro_temporal_attention_vad():
    cfg = {"T": 2, "Nc": 4, "Np": 16, "Nt": 8, "H": 2}
    model = build_model("spectro_temporal_attention_based_VAD", (7, 80, 1), cfg)
    x = jnp.zeros((4, 7, 80, 1))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=False)
    out, pipe, score = model.apply(variables, x, train=False)
    assert out.shape == (4, 7, 1)
    assert pipe.shape == (4, 7, 1)
    assert score.shape == (4, 7)
    np.testing.assert_allclose(np.asarray(score).sum(-1), 1.0, atol=1e-5)


def test_train_mode_updates_batch_stats():
    cfg = get_model_config("seldnet", search_paths=[])
    model = build_model("seldnet", (300, 64, 7), cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 300, 64, 7))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = jax.jit(model.init, static_argnames=("train",))(
        rngs, x, train=False)
    _, mutated = jax.jit(model.apply, static_argnames=("train", "mutable"))(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=("batch_stats",))
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_ss5_forward_statistical_pin():
    """Whole-model regression pin: SS5 forward statistics for a fixed seed
    and deterministic input (catches silent numerics drift in any layer)."""
    from seld_tpu.config import get_model_config
    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    model = build_model("conv_temporal", (300, 64, 7), cfg)
    x = jnp.asarray(np.linspace(-1, 1, 2 * 300 * 64 * 7, dtype=np.float32
                                ).reshape(2, 300, 64, 7))
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, x, train=False)
    sed, doa = jax.jit(model.apply, static_argnames=("train",))(
        v, x, train=False)
    # pinned on jax 0.9.0 / flax 0.12.3 (loose: init math, not bit layout);
    # re-pinned in round 2 after the TF-parity fixes (Keras LayerNorm
    # epsilon 1e-3, simple_dense_stage linear-activation quirk), and again
    # after the per-direction biGRU glorot fan fix (Keras Bidirectional
    # initializes each direction's [I, 3U] kernel separately — the old
    # stacked-shape fans halved the DOA-head init variance)
    assert float(jnp.mean(sed)) == pytest.approx(0.47327, abs=2e-3)
    assert float(jnp.std(sed)) == pytest.approx(0.24398, abs=2e-3)
    assert float(jnp.mean(doa)) == pytest.approx(-0.00306, abs=1e-3)
    assert float(jnp.std(doa)) == pytest.approx(0.07103, abs=3e-3)
