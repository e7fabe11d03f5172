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
