"""Aux subsystem tests: plots, profiling, threshold search."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.nas import analyzer as A
from seld_tpu.nas import plots as P
from seld_tpu.utils.profiling import StepTimer, trace
from seld_tpu.utils import io
from seld_tpu.inference.ensemble import search_thresholds


def _fake_pairs(n=30, seed=0):
    rng = np.random.RandomState(seed)
    pairs = []
    for _ in range(n):
        block = rng.choice(["mother_stage", "simple_dense_stage"])
        pairs.append({
            "config": {"BLOCK0": block,
                       "BLOCK0_ARGS": {"depth": int(rng.choice([1, 2]))}},
            "perf": {"test_seld_score": float(rng.rand())},
        })
    return pairs


def test_plots_render(tmp_path):
    pairs = _fake_pairs()
    p1 = P.plot_cdf_by_stage_count(pairs, "test_seld_score",
                                   str(tmp_path / "c1.png"))
    p2 = P.plot_cdf_by_stage_type(pairs, "test_seld_score",
                                  str(tmp_path / "c2.png"))
    table = A.build_table(pairs, ["test_seld_score"])
    p3 = P.plot_violin_by_feature(table, "BLOCK0", "test_seld_score",
                                  str(tmp_path / "v.png"))
    table["flops"] = np.random.RandomState(0).rand(len(pairs))
    p4 = P.plot_pareto(table, "test_seld_score", "flops",
                       str(tmp_path / "p.png"), color_by="BLOCK0")
    for p in (p1, p2, p3, p4):
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_step_timer():
    timer = StepTimer(warmup=1)
    x = jnp.ones((64, 64))
    f = jax.jit(lambda a: a @ a)
    for _ in range(5):
        with timer:
            y = f(x)
            jax.block_until_ready(y)
    s = timer.summary(items_per_step=64)
    assert s["steps"] == 4
    assert s["mean_s"] > 0 and s["items_per_sec"] > 0


def test_profiler_trace(tmp_path):
    with trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones(8) * 2)
    # trace directory written
    assert any("plugins" in r or f for r, d, f in os.walk(tmp_path))


def test_search_thresholds(tmp_path):
    rng = np.random.RandomState(0)
    n_classes, T = 4, 20
    sed_gt = (rng.rand(T, n_classes) < 0.3).astype(np.float32)
    doa = np.zeros((T, 3 * n_classes), np.float32)
    doa[:, :n_classes] = sed_gt  # x = 1 for active

    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    io.write_answer(str(gt_dir), "fold5_room1_mix001.csv", sed_gt, doa)

    # predictions: scores 0.5 for active, 0.45 for inactive ->
    # a threshold below 0.5 that stays above 0.45 is optimal
    scores = 0.45 + 0.05 * sed_gt
    outputs = [(jnp.asarray(scores), jnp.asarray(doa))]
    th, best = search_thresholds(
        outputs, ["fold5_room1_mix001"], str(gt_dir), str(tmp_path / "out"),
        n_classes=n_classes, candidates=(0.4, 0.48, 0.6), gt_polar=False)
    assert best < 0.5
    assert np.all(th <= 0.5)


def test_trace_analysis_classifier():
    from seld_tpu.utils.trace_analysis import _classify
    assert _classify(
        "%fusion.12 = f32[8]{0} fusion(%a), kind=kLoop") == "fusion:fusion"
    assert _classify(
        "%convolution.3 = f32[8]{0} convolution(%a, %b)"
    ) == "convolution:convolution"
    assert _classify("%add.5 = f32[8]{0} add(%a, %b)") == "add"
    # truncated metadata falls back to the lhs name
    assert _classify(
        "%multiply_reduce_fusion.102 = f32[256,300,64,32]{0,3,2,1:T"
    ) == "multiply_reduce_fusion"


def test_device_memory_stats_shape():
    from seld_tpu.utils.profiling import (device_memory_stats,
                                          format_memory_stats)
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # empty on the CPU backend
    assert isinstance(format_memory_stats(stats), str)
    assert "GiB" in format_memory_stats(
        {"bytes_in_use": 1 << 30, "peak_bytes_in_use": 2 << 30})
