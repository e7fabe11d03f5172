"""On-device augmentations (pure functions of an RNG key).

The reference applies these as tf.data map stages on the host
(transforms.py); here they are jittable batch ops fused into the compiled
train step so augmentation rides the TPU VPU and never blocks input feed.

  - time/freq masking      transforms.py:6-43 (`mask`): the reference's
    tf.while_loop + dynamic concat becomes fixed-shape iota comparisons
  - foa_intensity_vec_aug  transforms.py:78-114: per-sample axis sign flips
    + x/z swap applied consistently to IV channels and cartesian labels
  - acs_aug + mic_gcc_perm transforms.py:122-199: 8-way FOA+MIC channel-swap
    table (arXiv 2101.02919 Table 1) with matching GCC pair permutation
  - split_total_labels_to_sed_doa  transforms.py:117-119
  - random_ups_and_downs   trainv2.py:120-124 (random gain on mel channels)
  - mcs_aug (CGMM mask estimation, transforms.py:202-291) lives host-side in
    float64 — see `cgmm_mask_aug` below.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# SpecAugment-style masking
# ---------------------------------------------------------------------------
def _chunk_masks(rng, n_rows, total, max_mask_size, n_mask, dtype):
    """[n_rows, total] multiplicative mask; each row gets n_mask random spans."""
    rs, ro = jax.random.split(rng)
    sizes = jax.random.randint(rs, (n_rows, n_mask), 0, max_mask_size)
    offsets = jax.random.randint(ro, (n_rows, n_mask), 0, total)
    # reference draws offset in [0, total - size); emulate via modulo to stay
    # fixed-shape: offset <- offset % max(total - size, 1)
    offsets = offsets % jnp.maximum(total - sizes, 1)
    iota = jnp.arange(total)[None, None, :]              # [1, 1, total]
    inside = ((iota >= offsets[..., None]) &
              (iota < (offsets + sizes)[..., None]))     # [rows, n_mask, total]
    keep = ~jnp.any(inside, axis=1)
    return keep.astype(dtype)


def batch_mask(rng: jax.Array, specs: jnp.ndarray, axis: int,
               max_mask_size: Optional[int] = None, period: int = 100,
               n_mask: int = 1) -> jnp.ndarray:
    """Batched time/freq masking on [B, T, F, C].

    axis=-3 masks time (within each `period`-frame chunk, like the reference's
    tf.signal.frame by period), axis=-2 masks freq (a fresh mask per chunk).
    """
    b, t, f, c = specs.shape
    if t % period != 0:
        raise ValueError("(spec time length / period)'s rest must be 0")
    nchunk = t // period
    x = specs.reshape(b, nchunk, period, f, c)

    if axis in (-3, 1):
        total = period
        keep = _chunk_masks(rng, b * nchunk, total, max_mask_size or total,
                            n_mask, specs.dtype)
        keep = keep.reshape(b, nchunk, period, 1, 1)
    elif axis in (-2, 2):
        total = f
        keep = _chunk_masks(rng, b * nchunk, total, max_mask_size or total,
                            n_mask, specs.dtype)
        keep = keep.reshape(b, nchunk, 1, f, 1)
    else:
        raise ValueError(f"unsupported mask axis: {axis}")
    return (x * keep).reshape(b, t, f, c)


# ---------------------------------------------------------------------------
# FOA spatial augmentation
# ---------------------------------------------------------------------------
def _batched_take(x, idx, axis):
    """Per-sample gather: x [B, ...], idx [B, k] along `axis` (batch dims=1)."""
    ax = axis if axis < 0 else axis - 1  # vmap strips the batch dim
    return jax.vmap(lambda xi, ii: jnp.take(xi, ii, axis=ax))(x, idx)


def foa_intensity_vec_aug(rng: jax.Array, x: jnp.ndarray, y: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [B, T, F, 7] (4 mel + 3 IV), y [B, T', 4C] -> equally-transformed pair."""
    b = x.shape[0]
    n_classes = y.shape[-1] // 4
    y4 = y.reshape(*y.shape[:-1], 4, n_classes)

    iv = x[..., -3:]
    cart = y4[..., -3:, :]

    r_flip, r_perm = jax.random.split(rng)
    flip = jax.random.randint(r_flip, (b, 3), 0, 2).astype(x.dtype)
    iv = (1 - 2 * flip.reshape(b, 1, 1, 3)) * iv
    cart = (1 - 2 * flip.reshape(b, 1, 3, 1)) * cart

    # swap x/z axes half the time: perm = [0,1,2] or [2,1,0]
    p = 2 * jax.random.randint(r_perm, (b, 1), 0, 2)
    perm = jnp.concatenate([p, jnp.ones_like(p), 2 - p], axis=-1)  # [B, 3]
    correct = jnp.tile(jnp.asarray([[0, 1, 2]]), (b, 1))
    check = jnp.sum((perm != correct).astype(jnp.int32), -1, keepdims=True)
    feat_perm = (perm + check) % 3

    iv = _batched_take(iv, feat_perm, axis=-1)
    cart = _batched_take(cart.swapaxes(-1, -2), feat_perm,
                         axis=-1).swapaxes(-1, -2)
    foa = _batched_take(x[..., 1:4], perm, axis=-1)

    x = jnp.concatenate([x[..., :1], foa, iv], axis=-1)
    y4 = jnp.concatenate([y4[..., :-3, :], cart], axis=-2)
    return x, y4.reshape(*y.shape)


# 8-way channel-swap table (arXiv 2101.02919 Table 1): [[mic perm], [foa code]]
CHANNEL_LIST = np.asarray([
    [[1, 3, 0, 2], [0, -3, -2, 1]],
    [[3, 1, 2, 0], [0, -3, 2, -1]],
    [[0, 1, 2, 3], [0, 1, 2, 3]],
    [[1, 0, 3, 2], [0, -1, -2, 3]],
    [[2, 0, 3, 1], [0, 3, -2, -1]],
    [[0, 2, 1, 3], [0, 3, 2, 1]],
    [[3, 2, 1, 0], [0, -1, 2, -3]],
    [[2, 3, 0, 1], [0, 1, -2, -3]],
], dtype=np.int32)

# decode_table[m, n] = index of pair (min(m,n), max(m,n)) in the ordered GCC
# pair list [(0,1),(0,2),(0,3),(1,2),(1,3),(2,3)]
_GCC_DECODE = np.asarray([[0, 0, 1, 2],
                          [0, 0, 3, 4],
                          [1, 3, 0, 5],
                          [2, 4, 5, 0]], dtype=np.int32)
_GCC_PAIRS = np.asarray([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]],
                        dtype=np.int32)


def mic_gcc_perm(mic_perm: jnp.ndarray) -> jnp.ndarray:
    """[B, 4] mic permutation -> [B, 6] GCC-pair permutation
    (transforms.py:122-138)."""
    pairs = jnp.asarray(_GCC_PAIRS)                  # [6, 2]
    res = mic_perm[:, pairs]                         # [B, 6, 2] permuted pair
    decode = jnp.asarray(_GCC_DECODE)
    return decode[res[..., 0], res[..., 1]]          # [B, 6]


def acs_aug(rng: jax.Array, x: jnp.ndarray, y: jnp.ndarray
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Audio-channel-swap aug on joint FOA+MIC features.

    x [B, T, F, 17] = 4 foa mel + 3 IV + 4 mic mel + 6 GCC; y [B, T', 4C].
    """
    b = x.shape[0]
    n_classes = y.shape[-1] // 4
    y4 = y.reshape(*y.shape[:-1], 4, n_classes)

    iv = x[..., 4:7]
    cart = y4[..., -3:, :]

    idx = jax.random.randint(rng, (b,), 0, 8)
    flip = jnp.asarray(CHANNEL_LIST)[idx]            # [B, 2, 4]
    foa_flip = flip[:, 1, 1:]                        # [B, 3]

    foa_sign = jnp.sign(foa_flip)
    foa_perm = foa_sign * foa_flip - 1               # [B, 3] in {0,1,2}
    foa_sign = foa_sign.astype(x.dtype)
    correct = jnp.asarray([[0, 1, 2]])
    check = jnp.sum((foa_perm != correct).astype(jnp.int32), -1, keepdims=True)
    foa_feat_perm = (foa_perm + check) % 3

    foa_x = _batched_take(x[..., 1:4], foa_perm, axis=-1)
    iv = _batched_take(iv, foa_feat_perm, axis=-1) \
        * foa_sign[:, None, None, :]
    cart = _batched_take(cart.swapaxes(-1, -2), foa_feat_perm,
                         axis=-1).swapaxes(-1, -2) \
        * foa_sign[:, None, :, None]

    mic_flip = flip[:, 0, :]
    gcc = _batched_take(x[..., 11:], mic_gcc_perm(mic_flip), axis=-1)
    mic_x = _batched_take(x[..., 7:11], mic_flip, axis=-1)

    x = jnp.concatenate([x[..., :1], foa_x, iv, mic_x, gcc], axis=-1)
    y4 = jnp.concatenate([y4[..., :-3, :], cart], axis=-2)
    return x, y4.reshape(*y.shape)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------
def split_total_labels_to_sed_doa(x, y):
    n_classes = y.shape[-1] // 4
    return x, (y[..., :n_classes], y[..., n_classes:])


def random_ups_and_downs(rng: jax.Array, x: jnp.ndarray, y):
    """Random global gain offset on the log-mel channels (trainv2.py:120-124).

    FOA (7 ch): mels are channels 0:4. Joint FOA+MIC (17 ch): the SAME
    scene's MIC mels live at 7:11 and must receive the SAME gain, or
    acs_aug and the model see physically inconsistent channel pairs.
    IV/GCC channels are level-ratios/correlations and stay untouched.
    """
    gain = jax.random.normal(rng, ()) * 0.2
    if x.shape[-1] == 17:
        x = jnp.concatenate([x[..., :4] + gain, x[..., 4:7],
                             x[..., 7:11] + gain, x[..., 11:]], axis=-1)
    else:
        x = jnp.concatenate([x[..., :4] + gain, x[..., 4:]], axis=-1)
    return x, y


def compose(*fns: Callable) -> Callable:
    """Compose rng-keyed (x, y) transforms into one augment function."""
    def augment(rng, x, y):
        keys = jax.random.split(rng, len(fns))
        for key, fn in zip(keys, fns):
            x, y = fn(key, x, y)
        return x, y
    return augment


# ---------------------------------------------------------------------------
# CGMM mask-estimation aug (host-side, float64)
# ---------------------------------------------------------------------------
def cgmm_mask_aug(x: np.ndarray, iterations: int = 3,
                  theta: float = 1e-6) -> np.ndarray:
    """CGMM noisy/noise mask estimation (transforms.py:231-291, from the
    cgmm-mask-estimator recipe); returns x scaled by the estimated noise mask.

    x: [batch, time, freq, chan] real features. Kept host-side in float64 —
    the EM repeatedly inverts per-bin covariance matrices, which overflows in
    float32 (the reference also casts to f64, transforms.py:239).

    Golden parity: tests/test_tf_parity.py runs the reference's own mcs_aug
    and asserts allclose (rtol 1e-5). Wiring parity: the reference defines
    and unit-tests mcs_aug but never wires it into any trainer (no caller in
    train.py/trainv2.py) — and as shipped it cannot even run (transforms.py
    drops the `import math` that tf_cond:208 needs). This port keeps the
    same status: available as a host-side batch transform, not wired into
    scripts/train.py.
    """
    x = x.astype(np.float64)
    batch, time, freq, chan = x.shape
    eye = np.eye(chan)

    def stab(mat):
        # progressively add jitter until well-conditioned
        for dd in (1e-6, 1e-5, 1e-4, 1e-3, 1e-2, 1e-1):
            with np.errstate(all="ignore"):
                cond = np.linalg.cond(mat)
            bad = ~np.isfinite(cond) | (cond > 1e6)
            if not bad.any():
                break
            mat = mat + bad[..., None, None] * dd * eye
        return mat

    xt = x.transpose(0, 2, 3, 1)                       # [b, f, c, t]
    r_noisy = xt @ xt.transpose(0, 1, 3, 2) / time     # [b, f, c, c]
    r_noise = np.tile(eye, (batch, freq, 1, 1))

    yx = x[..., None]                                  # [b, t, f, c, 1]
    yyh = yx @ yx.transpose(0, 1, 2, 4, 3)             # [b, t, f, c, c]

    def safe_div(a, b):
        return a / np.maximum(b, 1e-8)

    r_noisy_inv = np.linalg.inv(stab(r_noisy))
    r_noise_inv = np.linalg.inv(stab(r_noise))
    phi_noisy = np.trace(yyh @ r_noisy_inv[:, None], axis1=-2, axis2=-1) / chan
    phi_noise = np.trace(yyh @ r_noise_inv[:, None], axis1=-2, axis2=-1) / chan

    lambda_noise = np.full((batch, time, freq), 0.5)
    for _ in range(iterations):
        r_noisy_s = stab(r_noisy)
        r_noise_s = stab(r_noise)
        r_noisy_inv = np.linalg.inv(r_noisy_s)
        r_noise_inv = np.linalg.inv(r_noise_s)

        def lik(r_inv, r_s, phi):
            k = (x[..., None, :] @ safe_div(r_inv[:, None],
                                            phi[..., None, None]))
            k = (k @ x[..., None])[..., 0, 0]
            det = np.linalg.det(phi[..., None, None] * r_s[:, None]) * np.pi
            return safe_div(np.exp(-np.clip(k, -700, 700)), det) + theta

        p_noise = lik(r_noise_inv, r_noise_s, phi_noise)
        p_noisy = lik(r_noisy_inv, r_noisy_s, phi_noisy)

        lambda_noise = safe_div(p_noise, p_noise + p_noisy)
        lambda_noisy = safe_div(p_noisy, p_noise + p_noisy)

        phi_noise = np.trace(yyh @ r_noise_inv[:, None],
                             axis1=-2, axis2=-1) / chan
        phi_noisy = np.trace(yyh @ r_noisy_inv[:, None],
                             axis1=-2, axis2=-1) / chan

        acc_noisy = safe_div(lambda_noisy, phi_noisy)[..., None, None] * yyh
        acc_noise = safe_div(lambda_noise, phi_noise)[..., None, None] * yyh
        r_noisy = safe_div(acc_noisy.sum(1),
                           lambda_noisy.sum(1)[..., None, None])
        r_noise = safe_div(acc_noise.sum(1),
                           lambda_noise.sum(1)[..., None, None])

    return (x * lambda_noise[..., None]).astype(np.float32)
