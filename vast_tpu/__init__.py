"""VAST-TPU: a TPU-native (JAX/XLA/Pallas) omni-modality framework.

Re-implementation of the capabilities of VAST (NeurIPS 2023) — vision /
audio / subtitle / text retrieval, captioning and QA — designed for TPU:
SPMD sharding over device meshes, one jitted train step, Pallas kernels
for the hot ops, and on-device preprocessing.
"""

__version__ = "0.1.0"
