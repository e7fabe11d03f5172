"""Import trained reference Keras checkpoints (legacy HDF5 files).

The reference trains in TF/Keras and saves its best models as legacy HDF5 —
``tf.keras.models.save_model(model, f'SWA_best_{score}.hdf5',
include_optimizer=False)`` (reference trainv2.py:366-369), reloaded by
evaluator.py:57 / make_answer.py:62 / search_best.py:64. Its published
ensemble is three such files (make_answer.py:102-115). This module maps
those weights onto the flax twins, so a reference user's *trained*
checkpoints serve on TPU without retraining:

    variables = import_keras_weights(model, variables, "SWA_best_x.hdf5", x)

(CLI: ``scripts/import_tf_weights.py`` writes an orbax checkpoint that
every inference tool here accepts.)

Mechanics
---------
A legacy Keras HDF5 stores one group per layer, keyed by the auto-generated
layer name (``conv2d_3``, ``batch_normalization_7``, ...). The numeric
suffix is Keras' per-base-name creation counter, so sorting one base's
groups by suffix recovers that base's creation order. The reference's
factory closures create layers at call time, which makes per-base creation
order equal the flax twin's application order — an equivalence pinned
layer-for-layer by tests/test_tf_parity.py, whose weight-mapping core
(`flax_call_order` / `set_mapped_weights`) lives here. Bases that share a
flax kind are disambiguated structurally, never by guessing:

* ``conv2d`` vs ``conv1d`` -> kernel rank (4 vs 3),
* ``gru``/``lstm``/``bidirectional`` -> direction count (kernel dim 0) and
  gate count (recurrent_kernel column ratio: 3=GRU, 4=LSTM),
* ``rel_position_multi_head_attention`` vs ``multi_head_attention(_)`` ->
  presence of ``pos_kernel``.

so no assumption about *cross*-base interleaving (e.g. Keras' topological
re-ordering of parallel SED/DOA heads in ``layer_names``) is ever needed.
Shape equality is asserted on every mapped tensor.
"""
from __future__ import annotations

import re
from collections import deque
from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["read_legacy_h5", "flax_call_order", "set_mapped_weights",
           "align_entries", "import_keras_weights", "H5Layer"]


# ---------------------------------------------------------------------------
# flax side: application-order capture of weight-bearing modules
# ---------------------------------------------------------------------------
# flax module type -> mapping kind (shared with tests/test_tf_parity.py)
FLAX_KIND = {
    "Conv": "conv",
    "Dense": "dense",
    "BatchNorm": "bn",       # inner flax nn.BatchNorm (leaf of our wrapper)
    "LayerNorm": "ln",
    "GRU": "rnn",
    "LSTM": "rnn",
    "MultiHeadAttention": "mha",
    "RelPositionMultiHeadAttention": "mha",
}


def flax_call_order(model, variables, x, **apply_kwargs):
    """[(kind, path)] of weight-bearing modules in application order."""
    import flax.linen as fnn

    record, seen = [], set()

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        tname = type(m).__name__
        if context.method_name == "__call__" and tname in FLAX_KIND:
            p = tuple(m.path)
            if p not in seen:
                seen.add(p)
                record.append((FLAX_KIND[tname], p))
        return next_fun(*args, **kwargs)

    with fnn.intercept_methods(interceptor):
        model.apply(variables, x, **apply_kwargs)
    # drop wrapper entries that are strict prefixes of deeper entries (our
    # BatchNorm wrapper and the inner flax nn.BatchNorm share a type name);
    # keep leaves only
    paths = {p for _, p in record}
    return [(k, p) for k, p in record
            if not any(q != p and q[:len(p)] == p for q in paths)]


def get_subtree(tree, path):
    for p in path:
        if tree is None or p not in tree:
            return None
        tree = tree[p]
    return tree


def to_mutable(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: to_mutable(v) for k, v in tree.items()}
    return tree


def set_mapped_weights(variables, flax_order, tf_entries):
    """Write TF layer weights onto flax params/batch_stats.

    `flax_order` is [(kind, path)] (from `flax_call_order`); `tf_entries` is
    the parallel [(kind, payload)] list. Payload formats per kind match
    Keras `get_weights()`:

    * conv/dense: [kernel(, bias)]
    * bn: [gamma, beta, moving_mean, moving_variance]
    * ln: [gamma, beta]
    * rnn: [kernel, recurrent_kernel, bias] * directions
    * mha: {param_name: array} (the reference's custom layers use the same
      `add_weight` names as our flax params, reference layers.py:146-201,
      :334-351) or the standard-Keras 8-tuple (q/k/v/out kernel+bias)
    """
    variables = to_mutable(variables)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")

    if len(flax_order) != len(tf_entries):
        raise ValueError(
            f"layer count mismatch: flax {len(flax_order)} vs tf "
            f"{len(tf_entries)}\nflax: {flax_order}\ntf: "
            f"{[k for k, _ in tf_entries]}")

    for (fkind, path), (tkind, payload) in zip(flax_order, tf_entries):
        if fkind != tkind:
            raise ValueError(f"kind mismatch at {path}: flax {fkind} vs "
                             f"tf {tkind}")
        sub = get_subtree(params, path)
        if sub is None:
            raise ValueError(f"no flax params at {path}")
        if fkind in ("conv", "dense"):
            kernel = payload[0]
            _check_shape(path, "kernel", sub["kernel"], kernel)
            sub["kernel"] = jnp.asarray(kernel)
            if len(payload) > 1:
                _check_shape(path, "bias", sub["bias"], payload[1])
                sub["bias"] = jnp.asarray(payload[1])
        elif fkind == "bn":
            gamma, beta, mean, var = payload
            _check_shape(path, "scale", sub["scale"], gamma)
            sub["scale"] = jnp.asarray(gamma)
            sub["bias"] = jnp.asarray(beta)
            stats = get_subtree(batch_stats, path)
            if stats is None:
                raise ValueError(f"no batch_stats at {path}")
            stats["mean"] = jnp.asarray(mean)
            stats["var"] = jnp.asarray(var)
        elif fkind == "ln":
            _check_shape(path, "scale", sub["scale"], payload[0])
            sub["scale"] = jnp.asarray(payload[0])
            sub["bias"] = jnp.asarray(payload[1])
        elif fkind == "rnn":
            n = len(payload)
            if n not in (3, 6):
                raise ValueError(f"{path}: unexpected rnn weight count {n}")
            dirs = n // 3
            kernel = np.stack([payload[3 * d] for d in range(dirs)])
            rec = np.stack([payload[3 * d + 1] for d in range(dirs)])
            bias = np.stack([payload[3 * d + 2] for d in range(dirs)])
            _check_shape(path, "kernel", sub["kernel"], kernel)
            sub["kernel"] = jnp.asarray(kernel)
            sub["recurrent_kernel"] = jnp.asarray(rec)
            _check_shape(path, "bias", sub["bias"], bias)
            sub["bias"] = jnp.asarray(bias)
        elif fkind == "mha":
            if isinstance(payload, dict):
                for name, w in payload.items():
                    if name not in sub:
                        raise ValueError(f"{path}: no param {name}")
                    _check_shape(path, name, sub[name], w)
                    sub[name] = jnp.asarray(w)
            else:  # standard keras MHA -> per-head kernels
                (qk, qb, kk, kb, vk, vb, ok, ob) = payload
                for name, w in [("query_kernel", qk.transpose(1, 0, 2)),
                                ("q_bias", qb),
                                ("key_kernel", kk.transpose(1, 0, 2)),
                                ("k_bias", kb),
                                ("value_kernel", vk.transpose(1, 0, 2)),
                                ("v_bias", vb),
                                ("projection_kernel", ok),
                                ("projection_bias", ob)]:
                    _check_shape(path, name, sub[name], w)
                    sub[name] = jnp.asarray(w)
    return variables


def _check_shape(path, name, have, got):
    if tuple(have.shape) != tuple(np.shape(got)):
        raise ValueError(f"{path}/{name}: flax {tuple(have.shape)} vs "
                         f"tf {tuple(np.shape(got))}")


# ---------------------------------------------------------------------------
# legacy HDF5 reading
# ---------------------------------------------------------------------------
# Keras auto-name base -> mapping kind
_BASE_KIND = {
    "conv2d": "conv",
    "conv1d": "conv",
    "dense": "dense",
    "batch_normalization": "bn",
    "layer_normalization": "ln",
    "gru": "rnn",
    "lstm": "rnn",
    "bidirectional": "rnn",
    "multi_head_attention": "mha",
    "multi_head_attention_": "mha",   # reference custom MHA (layers.py:102)
    "rel_position_multi_head_attention": "mha",  # layers.py:332
}

_NAME_RE = re.compile(r"^(.*?)(?:_(\d+))?$")


class H5Layer:
    """One weight-bearing layer group from a legacy Keras HDF5 file."""

    def __init__(self, name: str, weights: List[Tuple[str, np.ndarray]]):
        self.name = name
        m = _NAME_RE.fullmatch(name)
        self.base, idx = m.group(1), m.group(2)
        self.index = int(idx) if idx is not None else 0
        if self.base not in _BASE_KIND:
            raise ValueError(
                f"unsupported Keras layer '{name}' in checkpoint (base "
                f"'{self.base}'); supported: {sorted(_BASE_KIND)}")
        self.kind = _BASE_KIND[self.base]
        self.weights = weights
        self.payload = self._payload()

    # -- payload normalization to set_mapped_weights' per-kind formats -----
    def _by_basename(self) -> Dict[str, np.ndarray]:
        out = {}
        for path, arr in self.weights:
            out[path.rsplit("/", 1)[-1]] = arr
        return out

    def _payload(self):
        names = self._by_basename()
        if self.kind in ("conv", "dense"):
            p = [names["kernel"]]
            if "bias" in names:
                p.append(names["bias"])
            return p
        if self.kind == "bn":
            return [names["gamma"], names["beta"], names["moving_mean"],
                    names["moving_variance"]]
        if self.kind == "ln":
            return [names["gamma"], names["beta"]]
        if self.kind == "rnn":
            return self._rnn_payload()
        if self.kind == "mha":
            return self._mha_payload()
        raise AssertionError(self.kind)

    def _rnn_payload(self):
        if self.base != "bidirectional":
            names = self._by_basename()
            return [names["kernel"], names["recurrent_kernel"], names["bias"]]
        fwd = [(p, a) for p, a in self.weights if "backward" not in p]
        bwd = [(p, a) for p, a in self.weights if "backward" in p]
        if not bwd:  # no directional path markers: keras saves fwd then bwd
            half = len(self.weights) // 2
            fwd, bwd = self.weights[:half], self.weights[half:]
        out = []
        for half in (fwd, bwd):
            names = {p.rsplit("/", 1)[-1]: a for p, a in half}
            out += [names["kernel"], names["recurrent_kernel"], names["bias"]]
        return out

    def _mha_payload(self):
        if self.base in ("multi_head_attention_",
                         "rel_position_multi_head_attention"):
            return self._by_basename()
        # standard keras MHA: q/k/v/attention_output kernel+bias 8-tuple,
        # identified by the parent component in the weight path
        comp = {}
        for path, arr in self.weights:
            parts = path.split("/")
            leaf = parts[-1]
            parent = next((p for p in parts
                           if p.startswith(("query", "key", "value",
                                            "attention_output"))), None)
            if parent is None:
                # a custom layer that escaped base-name detection (e.g. a
                # user-renamed reference MHA): fall back to param names
                return self._by_basename()
            comp[(parent.split("_")[0] if not parent.startswith(
                "attention_output") else "out", leaf)] = arr
        try:
            return tuple(comp[k] for k in
                         [("query", "kernel"), ("query", "bias"),
                          ("key", "kernel"), ("key", "bias"),
                          ("value", "kernel"), ("value", "bias"),
                          ("out", "kernel"), ("out", "bias")])
        except KeyError as e:
            raise ValueError(f"{self.name}: standard-Keras MHA weight "
                             f"{e} missing") from None

    # -- structural subkind for cross-base disambiguation -------------------
    def subkind(self) -> tuple:
        if self.kind == "conv":
            return ("conv", self.payload[0].ndim)
        if self.kind == "rnn":
            dirs = len(self.payload) // 3
            rec = self.payload[1]
            return ("rnn", dirs, rec.shape[1] // rec.shape[0])
        if self.kind == "mha":
            if isinstance(self.payload, dict):
                return ("mha", "rel" if "pos_kernel" in self.payload
                        else "plain")
            return ("mha", "plain")
        return (self.kind,)


def _decode(v) -> str:
    return v.decode() if isinstance(v, bytes) else str(v)


def read_legacy_h5(path: str) -> List[H5Layer]:
    """Weight-bearing layers from a legacy Keras HDF5 file.

    Accepts both full-model files (reference `tf.keras.models.save_model`,
    weights under the `model_weights` group) and bare `save_weights` files
    (weights at the root). Weight names are normalized (`:0` stripped).
    """
    import h5py

    layers = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        if "layer_names" not in root.attrs:
            raise ValueError(
                f"{path}: no 'layer_names' attribute — not a legacy Keras "
                "HDF5 weights file (Keras 3 '.weights.h5' files are not the "
                "reference's format)")
        for name in root.attrs["layer_names"]:
            name = _decode(name)
            g = root[name]
            wnames = [_decode(w) for w in g.attrs.get("weight_names", [])]
            if not wnames:
                continue  # weightless layer (activation, pooling, dropout)
            weights = [(w[:-2] if w.endswith(":0") else w,
                        np.asarray(g[w])) for w in wnames]
            layers.append(H5Layer(name, weights))
    return layers


# ---------------------------------------------------------------------------
# alignment + top-level import
# ---------------------------------------------------------------------------
def _flax_subkind(kind: str, sub: Dict[str, Any]) -> tuple:
    if kind == "conv":
        return ("conv", sub["kernel"].ndim)
    if kind == "rnn":
        rec = sub["recurrent_kernel"]
        return ("rnn", sub["kernel"].shape[0], rec.shape[2] // rec.shape[1])
    if kind == "mha":
        return ("mha", "rel" if "pos_kernel" in sub else "plain")
    return (kind,)


def _is_init_ln(layer: H5Layer) -> bool:
    gamma, beta = layer.payload
    return bool(np.all(gamma == 1.0) and np.all(beta == 0.0))


def align_entries(variables, flax_order, h5_layers: Sequence[H5Layer]):
    """Match h5 layers to flax slots per structural subkind, in per-base
    creation order; returns tf_entries parallel to flax_order."""
    # within one subkind, multiple bases would make creation order ambiguous
    # (per-base counters are independent) — possible only for mha custom vs
    # standard, which the reference never mixes
    queues: Dict[tuple, deque] = {}
    for layer in sorted(h5_layers, key=lambda l: (l.base, l.index)):
        queues.setdefault(layer.subkind(), deque()).append(layer)
    for sk, q in queues.items():
        bases = {l.base for l in q}
        if len(bases) > 1 and sk[0] == "mha":
            raise ValueError(
                f"checkpoint mixes MHA flavors {sorted(bases)}: per-base "
                "creation order is ambiguous across them")

    # pre-LN attention_block quirk: the reference creates LayerNorms whose
    # outputs it discards (modules.py:560-568 applies the FF convs to x, not
    # ln(x)); our twins don't create them. Discarded LNs receive exactly
    # zero gradient (their output feeds nothing) and the reference's L2
    # regularizer touches kernels only (utils.py:343-350), so in ANY trained
    # checkpoint they still hold their exact init (gamma=1, beta=0) — drop
    # precisely the excess that is bit-exact init, error on any ambiguity.
    needed = sum(1 for kind, path in flax_order
                 if _flax_subkind(kind, get_subtree(variables["params"],
                                                    path)) == ("ln",))
    lnq = queues.get(("ln",))
    if lnq is not None and len(lnq) > needed:
        excess = len(lnq) - needed
        init_lns = [l for l in lnq if _is_init_ln(l)]
        if len(init_lns) != excess:
            raise ValueError(
                f"checkpoint has {len(lnq)} LayerNorms but the model uses "
                f"{needed}; {len(init_lns)} are at exact init "
                f"({[l.name for l in init_lns]}) which does not match the "
                f"excess of {excess} — cannot identify the reference's "
                "discarded pre-LN LayerNorms automatically; pass drop={...} "
                "with the unused layer names")
        dropped = {l.name for l in init_lns}
        queues[("ln",)] = deque(l for l in lnq if l.name not in dropped)

    params = variables["params"]
    entries = []
    for kind, path in flax_order:
        sk = _flax_subkind(kind, get_subtree(params, path))
        q = queues.get(sk)
        if not q:
            raise ValueError(
                f"checkpoint has no remaining layer for flax {path} "
                f"(subkind {sk}); per-subkind counts: flax needs more "
                f"{sk} than the file provides — wrong model_config for "
                "this checkpoint?")
        entries.append((kind, q.popleft().payload))
    leftover = [l.name for q in queues.values() for l in q]
    if leftover:
        raise ValueError(
            f"checkpoint layers left unmapped: {leftover} — wrong "
            "model_config for this checkpoint? (pass drop={...} to ignore "
            "layers deliberately)")
    return entries


def import_keras_weights(model, variables, h5_path: str, x,
                         apply_kwargs=None, drop: Sequence[str] = ()):
    """Map a reference legacy-HDF5 checkpoint onto flax `variables`.

    `model`/`variables` come from `build_model(...)` + `model.init(...)`;
    `x` is any correctly-shaped example input (used once, un-jitted, to
    record application order). `drop` names h5 layers to force-ignore
    (normally unnecessary: the pre-LN attention_block's discarded
    LayerNorms are detected and dropped automatically). Returns new
    variables (params + batch_stats).
    """
    apply_kwargs = dict(apply_kwargs or {"train": False})
    order = flax_call_order(model, variables, x, **apply_kwargs)
    order = [(k, p) for k, p in order
             if get_subtree(variables["params"], p)]
    layers = [l for l in read_legacy_h5(h5_path) if l.name not in set(drop)]
    entries = align_entries(variables, order, layers)
    return set_mapped_weights(variables, order, entries)
