"""NAS subsystem tests.

The central pattern mirrors the reference's complexity_test.py:363-392:
for each block, build the REAL flax block, and assert the analytic `params`
equals the actual parameter count and the analytic output shape matches the
real output shape. Plus sampler/constraint/search-driver/analyzer tests.
"""
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from `make test-fast`
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.config.registry import get_block
from seld_tpu.nas import complexity as C
from seld_tpu.nas.sampler import (
    conv_temporal_sampler, vad_architecture_sampler, sample_constraint,
    mother_stage_postprocess, search_space_sanity_check, config_sampling,
    complexity as fold_complexity)
from seld_tpu.nas.search import (SELD_SEARCH_SPACE_2D, SELD_SEARCH_SPACE_1D,
                                 RandomSearch, merge_results)
from seld_tpu.nas import analyzer as A


def count_params(variables):
    return sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))


def cross_validate(name, args, input_shape, cx_name=None):
    """analytic (params, out_shape) == real flax block (params, out_shape)."""
    block = get_block(name)(args)
    x = jnp.zeros((2, *input_shape))
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = block.apply(variables, x, train=False,
                      mutable=["batch_stats"])[0]

    cx, shape = C.get_stage_complexity(cx_name or name)(args, list(input_shape))
    assert cx["params"] == count_params(variables), \
        f"{name}: analytic {cx['params']} != real {count_params(variables)}"
    assert tuple(shape) == tuple(out.shape[1:]), \
        f"{name}: analytic shape {shape} != real {out.shape[1:]}"
    assert cx["flops"] > 0
    return cx


T, F, Cc = 20, 16, 8


def test_mother_block_cx():
    args = dict(filters0=8, filters1=12, filters2=16,
                kernel_size0=3, kernel_size1=3, kernel_size2=1,
                connect0=[1], connect1=[1, 1], connect2=[1, 1, 1],
                strides=(1, 2))
    cross_validate("mother_block", args, (T, F, Cc))


def test_mother_block_se_cx():
    args = dict(filters0=0, filters1=8, filters2=8,
                kernel_size0=0, kernel_size1=3, kernel_size2=3,
                connect0=[1], connect1=[1, 0], connect2=[0, 0, 1],
                squeeze_ratio=0.5)
    cross_validate("mother_block", args, (T, F, Cc))


def test_mother_stage_ss5_cx():
    args = dict(depth=2, filters0=0, filters1=96, filters2=0,
                kernel_size0=0, kernel_size1=3, kernel_size2=0,
                connect0=[1], connect1=[1, 0], connect2=[1, 0, 1],
                strides=[1, 3])
    cross_validate("mother_stage", args, (T, 12, 7))


def test_bigru_cx():
    cross_validate("bidirectional_GRU_block", {"units": [16, 16]}, (T, F, Cc))
    cross_validate("bidirectional_GRU_stage", {"depth": 2, "units": 16},
                   (T, 32))


@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_rnn_cx(rnn_type):
    cross_validate("RNN_block", {"units": 16, "rnn_type": rnn_type}, (T, 8))
    cross_validate("RNN_stage", {"depth": 2, "units": 16,
                                 "rnn_type": rnn_type}, (T, 8))


def test_simple_dense_cx():
    cross_validate("simple_dense_block", {"units": [24, 8]}, (T, F, Cc))
    cross_validate("simple_dense_stage",
                   {"depth": 2, "units": 24, "dense_activation": "relu"},
                   (T, 16))


def test_transformer_cx():
    cross_validate("transformer_encoder_block",
                   {"n_head": 2, "key_dim": 8, "ff_multiplier": 2,
                    "kernel_size": 3}, (T, 16))


@pytest.mark.parametrize("pos_mode", ["absolute", "relative"])
def test_conformer_cx(pos_mode):
    cross_validate("conformer_encoder_block",
                   {"key_dim": 8, "n_head": 2, "kernel_size": 4,
                    "multiplier": 2,
                    "pos_encoding": "basic" if pos_mode == "relative" else None,
                    "pos_mode": pos_mode},
                   (T, 16))
    cross_validate("conformer_encoder_stage",
                   {"depth": 2, "key_dim": 8, "n_head": 2, "kernel_size": 4,
                    "multiplier": 2, "pos_encoding": None}, (T, F, Cc))


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(abs_pos_encoding=True),
    dict(use_glu=True),
    dict(kernel_size=0),
    dict(ff_factor0=0.0),
])
def test_attention_cx(kwargs):
    args = {"key_dim": 8, "n_head": 2, "kernel_size": 4, "ff_kernel_size": 3,
            "ff_multiplier": 2.0, "ff_factor0": 0.5, "ff_factor1": 0.5}
    args.update(kwargs)
    cross_validate("attention_block", args, (T, 16))


def test_identity_cx():
    cx, shape = C.identity_block_complexity({}, [T, F, Cc])
    assert cx == {"flops": 0, "params": 0}


def test_conv_temporal_model_cx_vs_real_ss5():
    """Whole-model analytic params == real SS5 conv_temporal param count."""
    from seld_tpu.config import get_model_config
    from seld_tpu.models import build_model

    cfg = get_model_config("SS5", search_paths=[])
    model = build_model("conv_temporal", (300, 64, 7), cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 300, 64, 7)), train=False)
    real = count_params(variables)

    cx, (sed_shape, doa_shape) = C.conv_temporal_complexity(cfg, [300, 64, 7])
    assert cx["params"] == real, (cx["params"], real)
    assert sed_shape == [60, 12]
    assert doa_shape == [60, 36]
    # NAS budget sanity: SS5 sits near the 400-480 MFLOPs window
    assert 100e6 < cx["flops"] < 1e9


def test_vad_architecture_cx():
    from seld_tpu.models import build_model
    cfg = {"flatten": True, "last_unit": 1,
           "BLOCK0": "simple_dense_block",
           "BLOCK0_ARGS": {"units": [32, 16]}}
    model = build_model("vad_architecture", (7, 80), cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 7, 80)), train=False)
    cx, shape = C.vad_architecture_complexity(cfg, [7, 80])
    assert cx["params"] == count_params(variables)


# ------------------------------- sampler ----------------------------------
def test_sampler_respects_search_space():
    cfg = conv_temporal_sampler(SELD_SEARCH_SPACE_2D, SELD_SEARCH_SPACE_1D,
                                n_blocks=3, input_shape=(300, 64, 7),
                                default_config={"n_classes": 12},
                                config_postprocess_fn=mother_stage_postprocess)
    for i in range(3):
        assert f"BLOCK{i}" in cfg and f"BLOCK{i}_ARGS" in cfg
    assert cfg["SED"] in SELD_SEARCH_SPACE_1D
    assert cfg["DOA"] in SELD_SEARCH_SPACE_1D


def test_sampler_constraint_flops_window():
    constraint = sample_constraint(400_000_000, 480_000_000)
    cfg = conv_temporal_sampler(
        SELD_SEARCH_SPACE_2D, SELD_SEARCH_SPACE_1D, n_blocks=4,
        input_shape=(60, 32, 32),  # post-stem shape convention
        default_config={"n_classes": 12, "first_pool_size": [5, 2]},
        config_postprocess_fn=mother_stage_postprocess,
        constraint=constraint)
    # re-check constraint
    assert constraint(cfg, (60, 32, 32))


def test_sanity_check_raises():
    with pytest.raises(ValueError):
        search_space_sanity_check({"b": {"depth": []}})
    with pytest.raises(ValueError):
        search_space_sanity_check({"b": {"depth": 3}})


def test_config_sampling_recursive():
    space = {
        "BLOCK": ["a", "b"],
        "BLOCK_ARGS": {"a": {"x": [1, 2]}, "b": {"y": [3]}},
    }
    s = config_sampling(space)
    assert s["BLOCK"] in ("a", "b")
    if s["BLOCK"] == "a":
        assert s["BLOCK_ARGS"]["x"] in (1, 2)
    else:
        assert s["BLOCK_ARGS"] == {"y": 3}


def test_fold_complexity():
    cfg = {"BLOCK0": "simple_dense_block",
           "BLOCK0_ARGS": {"units": [8]},
           "BLOCK1": "identity_block", "BLOCK1_ARGS": {}}
    total = fold_complexity(cfg, [T, 16])
    assert total["params"] == (16 + 1) * 8


def test_postprocess_canonicalization():
    cfg = {"BLOCK0": "mother_stage",
           "BLOCK0_ARGS": {"depth": 1, "filters0": 0, "filters1": 0,
                           "filters2": 8, "kernel_size0": 3, "kernel_size1": 5,
                           "kernel_size2": 3, "connect0": [1],
                           "connect1": [1, 1], "connect2": [1, 1, 1],
                           "strides": (1, 2)}}
    out = mother_stage_postprocess(cfg)
    args = out["BLOCK0_ARGS"]
    assert args["kernel_size0"] == 0 and args["kernel_size1"] == 0
    assert args["connect1"][1] == 0 and args["connect2"][1] == 0
    assert args["connect2"][2] == 0
    assert list(args["strides"]) == [1, 1]


# ----------------------------- search driver ------------------------------
def test_random_search_resumable(tmp_path):
    train_config = {"lr": 1e-3, "batch": 4}

    def fake_eval(model_config):
        return {"test_seld_score": 0.5, "flops": 1, "params": 1}

    s1 = RandomSearch("unit_nas", train_config, results_dir=str(tmp_path),
                      min_flops=None, max_flops=None, n_blocks=2,
                      input_shape=(60, 32, 32))
    s1.run(3, fake_eval, verbose=False)
    assert s1.n_done == 3

    # resume continues from where it stopped
    s2 = RandomSearch("unit_nas", train_config, results_dir=str(tmp_path),
                      min_flops=None, max_flops=None, n_blocks=2,
                      input_shape=(60, 32, 32))
    assert s2.n_done == 3
    s2.run(5, fake_eval, verbose=False)
    assert s2.n_done == 5

    # mismatched train config refuses to resume
    with pytest.raises(ValueError):
        RandomSearch("unit_nas", {"lr": 5}, results_dir=str(tmp_path))


def test_random_search_end_to_end_tiny(tmp_path):
    """Full NAS loop with real (tiny) training."""
    from seld_tpu.data.loader import SeldDataset
    from seld_tpu.nas.search import train_and_eval_candidate

    rng = np.random.RandomState(0)
    n_classes = 12
    feats = [rng.randn(100, 16, 7).astype(np.float32)]
    labs = [(rng.rand(20, 4 * n_classes) < 0.1).astype(np.float32)]
    trainset = SeldDataset.from_clips(feats, labs, batch_size=2,
                                      label_window_size=10)
    testset = SeldDataset.from_clips(feats, labs, batch_size=2, train=False,
                                     label_window_size=10)

    space_1d = {"simple_dense_stage": {"depth": [1], "units": [8],
                                       "dense_activation": ["relu"],
                                       "dropout_rate": [0.0]}}
    search = RandomSearch(
        "tiny_nas", {"lr": 1e-3}, results_dir=str(tmp_path),
        search_space_2d={}, search_space_1d=space_1d, n_blocks=1,
        input_shape=(50, 16, 7), min_flops=None, max_flops=None)

    def evaluate(model_config):
        return train_and_eval_candidate(
            model_config, (50, 16, 7), trainset, testset,
            n_classes=n_classes, metric_block_size=5)

    results = search.run(2, evaluate, verbose=False)
    pairs = [v for k, v in results.items() if k.isdigit()]
    assert len(pairs) == 2
    assert all(np.isfinite(p["perf"]["test_seld_score"]) for p in pairs)
    assert all(p["perf"]["params"] > 0 for p in pairs)

    # explicit-device evaluation path (cpu backend)
    from seld_tpu.nas.search import train_and_eval_candidate
    perf = train_and_eval_candidate(
        pairs[0]["config"], (50, 16, 7), trainset, testset,
        n_classes=n_classes, metric_block_size=5, device="cpu")
    assert np.isfinite(perf["test_seld_score"])


def test_merge_results(tmp_path):
    a = {"train_config": {"lr": 1}, "000": {"config": {}, "perf": {"s": 1}}}
    b = {"train_config": {"lr": 1}, "000": {"config": {}, "perf": {"s": 2}},
         "001": {"config": {}, "perf": {"s": 3}}}
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    merged = merge_results([str(pa), str(pb)], str(tmp_path / "m.json"))
    assert sum(k.isdigit() for k in merged) == 3


# ------------------------------- analyzer ---------------------------------
def _fake_pairs(n=40, seed=0):
    rng = np.random.RandomState(seed)
    pairs = []
    for _ in range(n):
        units = int(rng.choice([8, 64]))
        pairs.append({
            "config": {"BLOCK0": "simple_dense_stage",
                       "BLOCK0_ARGS": {"depth": 1, "units": units}},
            # large units -> clearly better score + noise
            "perf": {"test_seld_score":
                     (0.3 if units == 64 else 0.6) + rng.rand() * 0.05},
        })
    return pairs


def test_extract_feats_and_table():
    pairs = _fake_pairs()
    feats = A.extract_feats_from_pairs(pairs)
    assert "BLOCK0_ARGS.units" in feats
    assert feats["BLOCK0_ARGS.units"] == {8, 64}
    table = A.build_table(pairs, ["test_seld_score"])
    assert len(table["test_seld_score"]) == 40


def test_ks_significance():
    pairs = _fake_pairs()
    table = A.build_table(pairs, ["test_seld_score"])
    sig = A.significant_features(table, "test_seld_score", alpha=0.05)
    assert "BLOCK0_ARGS.units" in sig


def test_pareto_frontier():
    xs = np.asarray([1.0, 2.0, 3.0, 2.5])
    ys = np.asarray([5.0, 4.0, 1.0, 3.0])
    fx, fy = A.pareto_frontier(xs, ys)
    assert 3.0 in fx and 1.0 in fy  # best x enters first
    assert fy[-1] == 5.0


def test_count_blocks():
    cfg = {"BLOCK0": "mother_stage", "BLOCK1": "simple_dense_stage",
           "BLOCK2": "bidirectional_GRU_stage"}
    assert A.count_blocks(cfg) == 2


def test_run_parallel_contract(tmp_path):
    """run_parallel preserves the resumable-JSON contract (contiguous
    indices, crash-safe ordering) and actually overlaps evaluations."""
    import time as _time
    import jax as _jax

    train_config = {"lr": 1e-3, "batch": 4}

    def fake_eval(model_config, device):
        _time.sleep(0.2)
        assert device is not None
        return {"test_seld_score": 0.5, "flops": 1, "params": 1}

    s = RandomSearch("par_nas", train_config, results_dir=str(tmp_path),
                     min_flops=None, max_flops=None, n_blocks=2,
                     input_shape=(60, 32, 32))
    t0 = _time.time()
    s.run_parallel(8, fake_eval, workers=8, devices=_jax.devices(),
                   verbose=False)
    elapsed = _time.time() - t0
    assert s.n_done == 8
    # 8 x 0.2s sleeps overlapped: well under the 1.6s serial time
    assert elapsed < 1.2, elapsed

    # indices are contiguous on disk
    import json as _json
    with open(s.path) as f:
        stored = _json.load(f)
    assert sorted(k for k in stored if k.isdigit()) == [
        f"{i:03}" for i in range(8)]

    # resume continues past the parallel batch
    s2 = RandomSearch("par_nas", train_config, results_dir=str(tmp_path),
                      min_flops=None, max_flops=None, n_blocks=2,
                      input_shape=(60, 32, 32))
    assert s2.n_done == 8
    s2.run_parallel(10, fake_eval, workers=2, verbose=False)
    assert s2.n_done == 10


@pytest.mark.slow
def test_run_parallel_real_candidates(tmp_path):
    """Real tiny-candidate evaluation through run_parallel across the
    8-device CPU mesh: the parallel path must produce valid, resumable
    results. (This host has a single CPU core — os.cpu_count()==1 — so no
    wall-clock speedup is physically measurable here; candidate OVERLAP is
    proven by the sleep-based contract test above, and the thread design
    targets one-candidate-per-chip placement on real multi-device meshes.)"""
    import os as _os
    import time as _time
    import jax as _jax
    from seld_tpu.data.loader import SeldDataset
    from seld_tpu.nas.search import train_and_eval_candidate

    rng = np.random.RandomState(0)
    n_classes = 12
    feats = [rng.randn(200, 16, 7).astype(np.float32)]
    labs = [(rng.rand(40, 4 * n_classes) < 0.1).astype(np.float32)]
    trainset = SeldDataset.from_clips(feats, labs, batch_size=2,
                                      label_window_size=10)
    testset = SeldDataset.from_clips(feats, labs, batch_size=2, train=False,
                                     label_window_size=10)

    space_1d = {"simple_dense_stage": {"depth": [1, 2],
                                       "units": [8, 12, 16, 24, 32, 48],
                                       "dense_activation": ["relu"],
                                       "dropout_rate": [0.0]}}
    k = 4

    def evaluate(model_config, device=None):
        return train_and_eval_candidate(
            model_config, (50, 16, 7), trainset, testset,
            n_classes=n_classes, metric_block_size=5, device=device)

    par = RandomSearch(
        "speed_par", {"lr": 1e-3}, results_dir=str(tmp_path),
        search_space_2d={}, search_space_1d=space_1d, n_blocks=1,
        input_shape=(50, 16, 7), min_flops=None, max_flops=None)
    par.run_parallel(k, evaluate, workers=4, devices=_jax.devices(),
                     verbose=False)

    pairs = [v for kk, v in par.results.items() if kk.isdigit()]
    assert len(pairs) == k
    assert all(np.isfinite(p["perf"]["test_seld_score"]) for p in pairs)
    assert all(p["perf"]["params"] > 0 for p in pairs)
    # resumable past the parallel batch
    par2 = RandomSearch(
        "speed_par", {"lr": 1e-3}, results_dir=str(tmp_path),
        search_space_2d={}, search_space_1d=space_1d, n_blocks=1,
        input_shape=(50, 16, 7), min_flops=None, max_flops=None)
    assert par2.n_done == k


def test_candidate_eval_device_resident_matches_host(tmp_path):
    """NAS candidate eval over DeviceDataset == the host-fed eval (the
    --device_data path of scripts/nas_search.py: splits staged once, every
    candidate gathers on device; single shard -> identical batches)."""
    import jax
    from seld_tpu.data.device_dataset import DeviceDataset
    from seld_tpu.data.loader import SeldDataset
    from seld_tpu.nas.search import train_and_eval_candidate
    from seld_tpu.parallel import make_mesh

    rng = np.random.RandomState(0)
    n_classes = 12
    feats = [rng.randn(100, 16, 7).astype(np.float32)]
    labs = [(rng.rand(20, 4 * n_classes) < 0.1).astype(np.float32)]
    config = {"FIRST": "simple_conv_block",
              "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 2]]},
              "SECOND": "simple_dense_block", "SECOND_ARGS": {"units": [8]},
              "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
              "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]}}

    host = train_and_eval_candidate(
        config, (50, 16, 7),
        SeldDataset.from_clips(feats, labs, batch_size=2,
                               label_window_size=10),
        SeldDataset.from_clips(feats, labs, batch_size=2, train=False,
                               label_window_size=10),
        n_classes=n_classes, metric_block_size=5, model_name="seldnet")

    mesh = make_mesh("data:1", devices=jax.devices()[:1])
    dev = train_and_eval_candidate(
        config, (50, 16, 7),
        DeviceDataset.from_clips(feats, labs, batch_size=2, mesh=mesh,
                                 label_window_size=10),
        DeviceDataset.from_clips(feats, labs, batch_size=2, mesh=mesh,
                                 train=False, label_window_size=10),
        n_classes=n_classes, metric_block_size=5, model_name="seldnet")

    for key in ("loss", "val_loss", "test_seld_score", "params"):
        np.testing.assert_allclose(host[key], dev[key], rtol=1e-6), key


def test_benjamini_hochberg_known_values():
    """BH step-up on a textbook example; q = min over i'>=i of p_i' * n/i'."""
    from seld_tpu.nas.analyzer import benjamini_hochberg
    p = [0.01, 0.04, 0.03, 0.005]
    q = benjamini_hochberg(p)
    # sorted p: .005 .01 .03 .04 -> ranked .02 .02 .04 .04 -> monotone same
    np.testing.assert_allclose(
        q, [0.02, 0.04, 0.04, 0.02], rtol=1e-12)
    # all equal p: q == p (n/n cancels after the step-up pass)
    np.testing.assert_allclose(benjamini_hochberg([0.5] * 5),
                               [0.5] * 5, rtol=1e-12)
    # monotone non-decreasing in p
    order = np.argsort(p)
    assert all(np.diff(np.asarray(q)[order]) >= -1e-15)


def test_bh_adjusted_features_family_control():
    """One real effect among many null features: the real one survives BH,
    and raw-significant flukes get honest q-values >> their raw p."""
    from seld_tpu.nas.analyzer import bh_adjusted_features

    rng = np.random.RandomState(0)
    n = 120
    perf = rng.rand(n)
    table = {"perf": perf}
    # 8 pure-noise binary features
    for i in range(8):
        table[f"noise{i}"] = rng.randint(0, 2, n)
    # one feature with a large true effect on perf
    real = rng.randint(0, 2, n)
    perf = perf + real * 2.0
    table["perf"] = perf
    table["real"] = real

    adj = bh_adjusted_features(table, "perf", min_samples=3)
    assert adj["real"]["min_q_bh"] < 0.01
    for i in range(8):
        d = adj[f"noise{i}"]
        # q is never smaller than raw p, and the family is counted
        assert d["min_q_bh"] >= d["min_p_raw"] - 1e-15
        assert d["n_tests"] == 1
    # exclude drops a column from the family entirely
    adj2 = bh_adjusted_features(table, "perf", min_samples=3,
                                exclude=["real"])
    assert "real" not in adj2


def test_threshold_swept_proxy_score_discriminates_below_half():
    """A candidate whose SED probabilities carry signal strictly below 0.5
    scores exactly 1.0 (no detections) at the fixed threshold but well
    below 1.0 at its searched threshold — the round-5 NAS proxy fix."""
    import jax
    import jax.numpy as jnp
    from seld_tpu.train import metrics as M

    rng = np.random.RandomState(0)
    n_classes, b, t = 4, 6, 20
    sed_true = (rng.rand(b, t, n_classes) < 0.3).astype(np.float32)
    doa_true = np.repeat(sed_true, 3, axis=-1) * 0.57735
    # predictions: correct signal, max prob 0.4 (under the 0.5 attractor)
    sed_pred = sed_true * 0.4 + 0.01
    doa_pred = doa_true

    def fold(th):
        ms = M.init_state(n_classes)
        ms = M.update(ms, (jnp.asarray(sed_true), jnp.asarray(doa_true)),
                      (jnp.asarray(sed_pred), jnp.asarray(doa_pred)),
                      block_size=10, sed_threshold=th)
        return float(M.calculate_seld_score(M.result(ms)))

    assert fold(0.5) == 1.0  # degenerate at the fixed threshold
    assert fold(0.2) < 0.05  # near-perfect at a searched threshold

    # the vmapped sweep (as used by _fit_and_score) agrees with the scalar
    thresholds = jnp.asarray([0.2, 0.5])
    ms0 = jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a]), M.init_state(n_classes))
    upd = jax.vmap(lambda ms, th: M.update(
        ms, (jnp.asarray(sed_true), jnp.asarray(doa_true)),
        (jnp.asarray(sed_pred), jnp.asarray(doa_pred)),
        block_size=10, sed_threshold=th), in_axes=(0, 0))
    msv = upd(ms0, thresholds)
    er, f, de, df = jax.vmap(lambda ms: jnp.stack(M.result(ms)))(msv).T
    selds = np.asarray(M.calculate_seld_score((er, f, de, df)))
    np.testing.assert_allclose(selds, [fold(0.2), fold(0.5)], atol=1e-6)
