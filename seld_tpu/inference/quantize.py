"""Weight-only quantization for serving artifacts.

The reference has no quantization story — it serves f32 Keras hdf5 through
a live TF process (evaluator.py:53-58, make_answer.py:58-63). TPU-native
serving bakes weights into StableHLO artifacts as constants (export.py), so
weight-only quantization shrinks the artifact and its HBM-resident
constants while activations and compute keep the model's dtype:

- ``int8``: per-output-channel symmetric int8 (4x smaller than f32, error
  bounded by scale/2 per element). Matmul-class kernels only (ndim >= 2,
  size >= min_size); biases, BN params and running stats stay f32 — they
  are tiny and BN stats are variance-sensitive.
- ``bfloat16``: every float leaf cast to bf16 (2x smaller, ~lossless for
  serving; bf16 keeps f32's exponent range so BN stats are safe).

Dequantization happens INSIDE the traced function: the artifact stores the
int8 words + f32 scales and the deployment-time XLA compile decides whether
to fold or fuse the dequant per backend. Exact semantics on device:
``w = q.astype(f32) * scale`` in f32, then cast to the original param dtype.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MODES = ("int8", "bfloat16")


@jax.tree_util.register_pytree_node_class
class QTensor:
    """A per-output-channel symmetric int8 tensor.

    ``q`` holds the int8 words, ``scale`` is f32 broadcastable over the
    last (output-channel) axis, ``dtype`` the original param dtype name so
    dequantization restores it exactly. Registered as a pytree node with
    ``dtype`` as STATIC aux data — quantized trees must be passable as jit
    arguments (the clip/streaming units do), and a string leaf would not be.
    """

    def __init__(self, q, scale, dtype: str = "float32"):
        self.q = q          # int8 [..., out]
        self.scale = scale  # f32  [1, ..., 1, out]
        self.dtype = dtype

    def tree_flatten(self):
        return (self.q, self.scale), self.dtype

    @classmethod
    def tree_unflatten(cls, dtype, children):
        return cls(children[0], children[1], dtype)

    def __repr__(self):
        shape = getattr(self.q, "shape", None)
        return f"QTensor(shape={shape}, dtype={self.dtype})"


def _is_q(x) -> bool:
    return isinstance(x, QTensor)


def _quantize_leaf(w, min_size: int):
    if not (hasattr(w, "dtype") and jnp.issubdtype(w.dtype, jnp.floating)):
        return w
    if w.ndim < 2 or w.size < min_size:
        return w
    wf = jnp.asarray(w, jnp.float32)
    axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(wf), axis=axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale, dtype=jnp.dtype(w.dtype).name)


def quantize_tree(variables, mode: str = "int8", *, min_size: int = 1024):
    """Quantize a variables pytree for artifact baking.

    Args:
      variables: full flax variable dict (params [+ batch_stats]).
      mode: "int8" (per-channel kernels, see module docstring) or
        "bfloat16" (cast every float leaf).
      min_size: int8 mode only — leave leaves smaller than this in f32
        (scales + int8 words would not pay for themselves, and 1-d
        bias/BN leaves are excluded by the ndim >= 2 rule anyway).

    Returns a pytree of the same structure where quantized leaves are
    `QTensor`s (int8) or bf16 arrays; feed to `dequantize_tree` inside the
    function being exported.
    """
    if mode not in _MODES:
        raise ValueError(f"quantize mode {mode!r}: pick from {_MODES}")
    if mode == "bfloat16":
        return jax.tree_util.tree_map(
            lambda w: w.astype(jnp.bfloat16)
            if (hasattr(w, "dtype") and jnp.issubdtype(w.dtype, jnp.floating))
            else w, variables)
    return jax.tree_util.tree_map(
        lambda w: _quantize_leaf(w, min_size), variables)


def dequantize_tree(qtree):
    """Reconstruct a variables pytree: QTensor -> scale * q (f32 math,
    cast back to the original dtype); bf16/f32 leaves pass through as-is
    (model param promotion handles bf16 like any mixed-precision load)."""
    def deq(x):
        if _is_q(x):
            w = x.q.astype(jnp.float32) * x.scale
            return w.astype(jnp.dtype(x.dtype))
        return x
    return jax.tree_util.tree_map(deq, qtree, is_leaf=_is_q)


def wrap_dequant(apply_fn):
    """``apply_fn`` lifted over a quantized tree: the returned function has
    the same ``fn(variables, x, ...)`` signature but dequantizes its first
    argument on device before calling through. The single wrapping point
    for every export unit (export.py) and `quantized_apply`."""
    def fn(v, *args, **kwargs):
        return apply_fn(dequantize_tree(v), *args, **kwargs)
    return fn


def quantized_apply(apply_fn, variables, mode: str = "int8", *,
                    min_size: int = 1024):
    """Bind `apply_fn` to quantized weights for export.

    Returns ``(fn, qtree)`` where ``fn(x, **kw)`` dequantizes the closed-over
    qtree on device and calls ``apply_fn``. Tracing `fn` (jit/jax.export)
    bakes the int8 words + scales as the program's constants.
    """
    qtree = quantize_tree(variables, mode, min_size=min_size)
    wrapped = wrap_dequant(apply_fn)

    def fn(x, **kwargs):
        return wrapped(qtree, x, **kwargs)

    return fn, qtree


def quantization_report(variables, qtree) -> dict:
    """Size + error accounting for a quantized tree (host-side, for CLI
    printing and tests): bytes before/after and the max per-element
    reconstruction error over quantized leaves."""
    before = sum(np.asarray(w).nbytes
                 for w in jax.tree_util.tree_leaves(variables))
    after = 0
    max_err = 0.0
    n_quantized = 0
    deq = dequantize_tree(qtree)
    for w, d, q in zip(jax.tree_util.tree_leaves(variables),
                       jax.tree_util.tree_leaves(deq),
                       jax.tree_util.tree_leaves(
                           qtree, is_leaf=_is_q)):
        if _is_q(q):
            after += np.asarray(q.q).nbytes + np.asarray(q.scale).nbytes
            n_quantized += 1
        else:
            after += np.asarray(q).nbytes
        err = np.max(np.abs(np.asarray(w, np.float32)
                            - np.asarray(d, np.float32)), initial=0.0)
        max_err = max(max_err, float(err))
    return {"bytes_before": int(before), "bytes_after": int(after),
            "n_quantized_leaves": n_quantized, "max_abs_error": max_err}
