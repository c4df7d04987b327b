"""EgoVLPv2-TPU: a TPU-native (JAX/XLA/Pallas/pjit) video-language pre-training framework.

A ground-up rebuild of the capabilities of facebookresearch/EgoVLPv2 (ICCV'23):
TimeSformer-style divided space-time video encoder + RoBERTa text encoder with
FIBER-style gated cross-modal fusion in the last blocks of each backbone,
trained with EgoNCE + MLM + ITM objectives, data-parallel over a TPU mesh.

Reference capability map: see SURVEY.md at the repo root. The reference
implementation is PyTorch/CUDA (`EgoVLPv2/model/*.py`); this package is an
independent TPU-first design: global-batch SPMD math under `jit` over a
`jax.sharding.Mesh` (XLA inserts the ICI collectives that the reference
hand-writes with NCCL all-gathers), Pallas kernels for the attention hot
paths, bf16 MXU compute with f32 accumulation, and `jax.checkpoint` remat.
"""

__version__ = "0.1.0"
