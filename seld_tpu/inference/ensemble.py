"""Sliding-window overlap-add inference.

Parity target: `ensemble_outputs` (trainv2.py:158-192, evaluator.py:16-64,
make_answer.py:21-55): frame each full clip into win=300-feature-frame
windows at step=5 (60x data expansion), batch the windows through the model,
and average the per-window label-domain outputs back into a full-length
sequence by overlap-add normalized with window counts.

TPU-native design: the whole per-clip pass is ONE jitted function — windows
are gathered per chunk inside `lax.map` (never materializing the 60x-expanded
tensor in HBM), and the overlap-add is a scatter-add. Chunks of `batch_size`
windows keep the MXU batch large; the window axis is the natural axis to
shard across devices for clip-level throughput.

Submission tooling (make_answer.py:125-176): model-averaged ensembles,
per-class SED thresholds, DCASE CSV writing, official scoring.
"""
from __future__ import annotations

import functools
import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.train.official_metrics import SELDMetricsOfficial
from seld_tpu.train.metrics import calculate_seld_score
from seld_tpu.utils import io


# per-class SED decision thresholds of the shipped submission
# (make_answer.py:156)
DEFAULT_CLASS_THRESHOLDS = np.asarray(
    [0.35, 0.35, 0.3, 0.4, 0.65, 0.6, 0.45, 0.55, 0.3, 0.3, 0.45, 0.3],
    dtype=np.float32)


def sliding_windows(x: jnp.ndarray, win_size: int, step: int) -> jnp.ndarray:
    """[T, ...] -> [n_win, win_size, ...] (tf.signal.frame parity, no pad)."""
    n_win = (x.shape[0] - win_size) // step + 1
    idx = np.arange(n_win)[:, None] * step + np.arange(win_size)[None, :]
    return x[idx]


def overlap_add(frames: jnp.ndarray, step: int = 1) -> jnp.ndarray:
    """[n_win, L, C] -> [(n_win-1)*step + L, C] scatter-add."""
    n, l, c = frames.shape
    t = (n - 1) * step + l
    idx = (np.arange(n)[:, None] * step + np.arange(l)[None, :]).reshape(-1)
    out = jnp.zeros((t, c), frames.dtype)
    return out.at[idx].add(frames.reshape(n * l, c))


@functools.partial(jax.jit, static_argnames=("apply_fn", "win_size",
                                             "step_size", "batch_size",
                                             "data_axis"))
def _predict_clip(variables, x, *, apply_fn, win_size: int, step_size: int,
                  batch_size: int, data_axis: Optional[str] = None):
    """One full clip [T_f, F, C] -> overlap-added (sed [T_l, C], doa [T_l, 3C]).

    With `data_axis` set (under a Mesh), each chunk's window batch is
    sharding-constrained over that axis so GSPMD splits the forward across
    devices — the window axis is the natural ICI-sharding axis for clip
    inference (SURVEY §5).
    """
    t_f = x.shape[0]
    n_win = (t_f - win_size) // step_size + 1

    def forward(windows):
        if data_axis is not None:
            from jax.sharding import PartitionSpec as P
            windows = jax.lax.with_sharding_constraint(
                windows, P(data_axis, None, None, None))
        return apply_fn(variables, windows, train=False)

    sed, doa = _chunked_windows_forward(x, win_size, step_size, n_win,
                                        batch_size, forward)
    return _overlap_add_normalized(sed, doa, win_size, step_size)


def _chunked_windows_forward(source, twin: int, tstep: int, n_win: int,
                             batch_size: int, forward):
    """Gather [twin]-frame windows of `source` ([T, ...]) at stride `tstep`
    in chunks of `batch_size` and run `forward` on each chunk (the shared
    machinery of the exact and fast sliding-window paths)."""
    n_chunks = -(-n_win // batch_size)
    win_idx = np.arange(twin)

    def chunk_fn(chunk):
        starts = (chunk * batch_size + jnp.arange(batch_size)) * tstep
        # clamp so padded windows gather valid data (sliced off later)
        starts = jnp.minimum(starts, source.shape[0] - twin)
        return forward(source[starts[:, None] + win_idx[None, :]])

    seds, doas = jax.lax.map(chunk_fn, jnp.arange(n_chunks))
    sed = seds.reshape(-1, *seds.shape[2:])[:n_win]
    doa = doas.reshape(-1, *doas.shape[2:])[:n_win]
    return sed, doa


def _overlap_add_normalized(sed, doa, win_size: int, step_size: int):
    """Validate the feature/label geometry and overlap-add with count
    normalization (trainv2.py:158-192 semantics)."""
    n_win, label_win = sed.shape[0], sed.shape[1]
    if win_size % label_win:
        raise ValueError(
            f"win_size={win_size} not a multiple of the model's label "
            f"window {label_win}")
    multiplier = win_size // label_win
    if step_size % multiplier:
        raise ValueError(
            f"step_size={step_size} must be a multiple of the feature/label "
            f"frame multiplier {multiplier} (win {win_size} -> {label_win} "
            f"label frames)")
    label_step = step_size // multiplier
    # accumulate in f32 regardless of the model's compute dtype: a frame
    # receives up to win/step (= 60) overlapping contributions, which would
    # lose ~2 decimal digits summed in bf16
    sed = sed.astype(jnp.float32)
    doa = doa.astype(jnp.float32)
    counts = overlap_add(jnp.ones((n_win, label_win, 1)), label_step)
    return (overlap_add(sed, label_step) / counts,
            overlap_add(doa, label_step) / counts)


@functools.partial(jax.jit, static_argnames=("apply_fn", "win_size",
                                             "step_size", "batch_size",
                                             "time_down", "data_axis"))
def _predict_clip_fast(variables, x, *, apply_fn, win_size: int,
                       step_size: int, batch_size: int, time_down: int,
                       data_axis=None):
    """Fast sliding window: the time-local trunk (stem + conv body — ~95%
    of the model's FLOPs) runs ONCE over the full clip; only the sequence
    blocks + heads slide.

    Convolution translation-equivariance makes this near-exact rather than
    exact: the per-window path zero-pads at each window's own edges while the
    full-clip trunk sees the real neighboring frames, so predictions can
    differ within a conv receptive field of each window edge (interior
    frames are bit-identical). The model's total time downsampling
    (`time_down`, the stem pool's time stride for conv_temporal) must
    divide `step_size` so every window start lands on a trunk frame; it is
    validated against the trunk's actual output length below.
    """
    t_f = x.shape[0]
    if win_size % time_down or step_size % time_down:
        raise ValueError(
            f"fast path needs win_size ({win_size}) and step_size "
            f"({step_size}) divisible by the trunk time stride {time_down}")
    n_win = (t_f - win_size) // step_size + 1
    trunk = apply_fn(variables, x[None], train=False, stage="trunk")[0]
    if trunk.shape[0] != t_f // time_down:
        raise ValueError(
            f"time_down={time_down} does not match the model: a "
            f"{t_f}-frame clip produced {trunk.shape[0]} trunk frames "
            f"(expected {t_f // time_down}). Pass the model's actual total "
            f"time downsampling (conv_temporal: first_pool_size[0]).")

    def head(windows):
        if data_axis is not None:
            from jax.sharding import PartitionSpec as P
            windows = jax.lax.with_sharding_constraint(
                windows, P(data_axis, *([None] * (windows.ndim - 1))))
        return apply_fn(variables, windows, train=False, stage="head")

    # the head's sequence blocks are a small-op tail, so per-clip cost
    # scales with CHUNK COUNT more than with window count: run all windows
    # in one chunk when they fit (a 60 s clip is 541 windows = ~12.5 MB of
    # [541, 60, 192] activations — nowhere near HBM limits). Measured 1.9x
    # on the device fast path (7.6 -> 3.9 ms/clip, round 3).
    eff_batch = batch_size
    if n_win <= max(batch_size, 1024):
        eff_batch = -(-n_win // 8) * 8  # pad to sublane multiple
    sed, doa = _chunked_windows_forward(
        trunk, win_size // time_down, step_size // time_down, n_win,
        eff_batch, head)
    return _overlap_add_normalized(sed, doa, win_size, step_size)


@functools.partial(jax.jit, static_argnames=("apply_fn", "win_size",
                                             "step_size", "time_down",
                                             "data_axis"))
def _predict_clips_fast_batched(variables, xs, *, apply_fn, win_size: int,
                                step_size: int, time_down: int,
                                data_axis=None):
    """Multi-clip fast path: trunks batched over clips, then ALL clips'
    windows run through the sequence head as ONE chunk.

    The head is a small-op tail whose per-clip cost scales with chunk
    count (see _predict_clip_fast); stacking `N` equal-length clips
    amortizes it N-ways on top of the one-chunk win. xs [N, T_f, F, C] ->
    (sed [N, T_l, C], doa [N, T_l, 3C]); numerically identical to N calls
    of _predict_clip_fast (same trunk values by batch independence, same
    head on the same windows).
    """
    n, t_f = xs.shape[0], xs.shape[1]
    if win_size % time_down or step_size % time_down:
        raise ValueError(
            f"fast path needs win_size ({win_size}) and step_size "
            f"({step_size}) divisible by the trunk time stride {time_down}")
    n_win = (t_f - win_size) // step_size + 1
    trunks = apply_fn(variables, xs, train=False, stage="trunk")
    if trunks.shape[1] != t_f // time_down:
        raise ValueError(
            f"time_down={time_down} does not match the model: "
            f"{t_f}-frame clips produced {trunks.shape[1]} trunk frames "
            f"(expected {t_f // time_down})")
    twin, tstep = win_size // time_down, step_size // time_down
    idx = (np.arange(n_win)[:, None] * tstep
           + np.arange(twin)[None, :])                 # [n_win, twin]
    windows = trunks[:, idx]                           # [N, n_win, twin, ..]
    flat = windows.reshape(n * n_win, *windows.shape[2:])
    pad = (-flat.shape[0]) % 8
    if pad:  # zero rows (not a slice of flat: flat may have < pad rows)
        flat = jnp.pad(flat, ((0, pad),) + ((0, 0),) * (flat.ndim - 1))
    if data_axis is not None:
        from jax.sharding import PartitionSpec as P
        flat = jax.lax.with_sharding_constraint(
            flat, P(data_axis, *([None] * (flat.ndim - 1))))
    sed, doa = apply_fn(variables, flat, train=False, stage="head")
    sed = sed[: n * n_win].reshape(n, n_win, *sed.shape[1:])
    doa = doa[: n * n_win].reshape(n, n_win, *doa.shape[1:])
    return jax.vmap(
        lambda s, d: _overlap_add_normalized(s, d, win_size, step_size)
    )(sed, doa)


def ensemble_outputs(apply_fn: Callable, variables, xs: Sequence,
                     win_size: int = 300, step_size: int = 5,
                     batch_size: int = 256,
                     mesh=None, data_axis: str = "data",
                     fast: bool = False, time_down: int = 5,
                     clip_batch: int = 1
                     ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-clip sliding-window predictions for a list of full clips.

    Pass `mesh` to shard each window batch over `data_axis` (batch_size
    should be a multiple of the axis size).

    fast=True computes the time-local trunk once per clip and slides only
    the sequence blocks + heads (conv_temporal only; requires
    step_size % time_down == 0, where time_down is the stem pool's time
    stride). Near-exact: window-edge frames can differ from the per-window
    reference path within a conv receptive field (see _predict_clip_fast);
    the exact path remains the default and the parity baseline.
    clip_batch > 1 stacks equal-length clips with ALL their windows in one
    head chunk (numerically identical, equality-tested) — measured WORSE on
    v5e (5.03 -> 7.65/6.09 ms/clip bf16 at clip_batch 4/8: the stacked
    window gather materializes where the per-clip one fuses), so the
    default stays clip-at-a-time; kept opt-in for future toolchains.
    """
    import contextlib
    ctx = mesh if mesh is not None else contextlib.nullcontext()
    axis = data_axis if mesh is not None else None

    outs = []
    if fast and clip_batch > 1:
        # group consecutive equal-shape clips into stacked batches
        outs_by_idx = {}
        with ctx:
            i = 0
            while i < len(xs):
                group = [i]
                while (len(group) < clip_batch and i + len(group) < len(xs)
                       and np.shape(xs[i + len(group)]) == np.shape(xs[i])):
                    group.append(i + len(group))
                if len(group) == 1:
                    outs_by_idx[i] = _predict_clip_fast(
                        variables, jnp.asarray(xs[i]), apply_fn=apply_fn,
                        win_size=win_size, step_size=step_size,
                        batch_size=batch_size, time_down=time_down,
                        data_axis=axis)
                else:
                    stacked = jnp.stack([jnp.asarray(xs[j]) for j in group])
                    seds, doas = _predict_clips_fast_batched(
                        variables, stacked, apply_fn=apply_fn,
                        win_size=win_size, step_size=step_size,
                        time_down=time_down, data_axis=axis)
                    for k, j in enumerate(group):
                        outs_by_idx[j] = (seds[k], doas[k])
                i += len(group)
        return [outs_by_idx[i] for i in range(len(xs))]

    with ctx:
        for x in xs:
            if fast:
                outs.append(_predict_clip_fast(
                    variables, jnp.asarray(x), apply_fn=apply_fn,
                    win_size=win_size, step_size=step_size,
                    batch_size=batch_size, time_down=time_down,
                    data_axis=axis))
            else:
                outs.append(_predict_clip(
                    variables, jnp.asarray(x), apply_fn=apply_fn,
                    win_size=win_size, step_size=step_size,
                    batch_size=batch_size, data_axis=axis))
    return outs


def average_ensemble(model_outputs: Sequence[Sequence[Tuple]]
                     ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Average (sed, doa) across models: [model][clip] -> [clip]
    (make_answer.py:133-140)."""
    outputs = []
    for per_clip in zip(*model_outputs):
        seds, doas = zip(*per_clip)
        outputs.append((sum(seds) / len(seds), sum(doas) / len(doas)))
    return outputs


def evaluate_clips_official(outputs: Sequence[Tuple], label_names: Sequence[str],
                            gt_dir: str, output_dir: str,
                            thresholds=0.5, n_classes: int = 12,
                            gt_polar: bool = True,
                            doa_threshold: float = 20.0):
    """Write DCASE CSVs for predictions and score with the official metric.

    Parity: generate_evaluate_fn (trainv2.py:195-237) / make_answer.py:159-176.
    Returns (seld_score, (ER, F, LE, LR)).
    """
    os.makedirs(output_dir, exist_ok=True)
    scorer = SELDMetricsOfficial(doa_threshold=doa_threshold,
                                 nb_classes=n_classes)
    for name, (sed, doa) in zip(label_names, outputs):
        sed = np.asarray(sed)
        doa = np.asarray(doa)
        answer_class = sed > thresholds
        io.write_answer(output_dir, name + ".csv", answer_class, doa)
        pred = io.load_output_format_file(
            os.path.join(output_dir, name + ".csv"))
        pred = io.segment_labels(pred, answer_class.shape[0])
        gt = io.load_output_format_file(os.path.join(gt_dir, name + ".csv"))
        if gt_polar:
            gt = io.convert_output_format_polar_to_cartesian(gt)
        gt = io.segment_labels(gt, answer_class.shape[0])
        scorer.update_seld_scores(pred, gt)

    metric_values = scorer.compute_seld_scores()
    return float(calculate_seld_score(metric_values)), metric_values


def search_thresholds(outputs, label_names, gt_dir: str, output_dir: str,
                      n_classes: int = 12,
                      candidates=(0.3, 0.35, 0.4, 0.45, 0.55, 0.6, 0.65, 0.7),
                      gt_polar: bool = True, verbose: bool = False):
    """Greedy per-class SED threshold search on a validation split
    (search_best.py / analyzer.py __main__ threshold-sweep machinery).

    Coordinate descent: sweep each class's threshold over `candidates`,
    keeping the best SELD score; one pass over all classes.
    Returns (best_thresholds [n_classes], best_score).
    """
    thresholds = np.full(n_classes, 0.5, np.float32)

    def score_with(th):
        seld, _ = evaluate_clips_official(
            outputs, label_names, gt_dir, output_dir,
            thresholds=th, n_classes=n_classes, gt_polar=gt_polar)
        return seld

    best = score_with(thresholds)
    for cls in range(n_classes):
        for cand in candidates:
            trial = thresholds.copy()
            trial[cls] = cand
            s = score_with(trial)
            if s < best:
                best = s
                thresholds = trial
        if verbose:
            print(f"class {cls}: th={thresholds[cls]:.2f} seld={best:.5f}")
    return thresholds, best
