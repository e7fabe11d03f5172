"""seld_tpu — a TPU-native SELD (sound event localization & detection) framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the IRIS-AUDIO/SELD
research stack (DCASE2021 Task 3). The compute path is pure functional JAX
(jit / shard_map over a `jax.sharding.Mesh`), the feature front-end runs
on-device (fused STFT -> mel -> intensity-vector kernels), and training is
SPMD data-parallel over ICI.

Subpackages
-----------
config     : run/model config system (loads the reference model_config JSONs)
ops        : on-device signal processing (STFT, mel, FOA-IV, GCC-PHAT, Pallas)
models     : block registry + model builders (seldnet family, conv_temporal, VAD)
parallel   : device mesh & sharding helpers
train      : losses, metrics, optimizers, training loops, SWA, checkpointing
data       : host-side data pipeline, windowing, augmentation drivers
inference  : sliding-window ensemble inference and DCASE submission tooling
nas        : analytic complexity + random-search NAS subsystem
utils      : small numeric/IO utilities (DCASE CSV formats, conversions)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences (keeps `import seld_tpu` dependency-free)."""
    if name == "build_model":
        from seld_tpu.models import build_model
        return build_model
    if name == "get_model_config":
        from seld_tpu.config import get_model_config
        return get_model_config
    if name == "SELDTrainer":
        from seld_tpu.train.trainer import SELDTrainer
        return SELDTrainer
    if name == "make_mesh":
        from seld_tpu.parallel import make_mesh
        return make_mesh
    raise AttributeError(f"module 'seld_tpu' has no attribute {name!r}")
