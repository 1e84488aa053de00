"""noise_flow_tpu — a TPU-native conditional normalizing-flow framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
BorealisAI/noise_flow (ICCV'19 "Noise Flow: Noise Modeling with Conditional
Normalizing Flows"): conditional bijector library, arch-DSL flow models,
exact-NLL training, temperature-scaled sampling, SIDD raw data pipeline,
marginal-KLD evaluation, and the downstream DnCNN denoiser — all built
TPU-first (pjit/shard_map over device meshes, fused XLA/Pallas kernels,
functional state threading instead of TF1 graph mutation).

Reference parity notes cite files in the upstream repo as ``ref:<path>:<lines>``.
"""

__version__ = "0.1.0"

from noise_flow_tpu.config import Config, default_config  # noqa: F401
from noise_flow_tpu.models.flow import NoiseFlow  # noqa: F401
