"""dpft_tpu: a TPU-native camera + 4D-radar 3D object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of TUMFTM/DPFT
(reference layout documented in SURVEY.md). The public surface mirrors the
reference CLIs (`python -m dpft_tpu.prepare/train/evaluate`) and the
`config/kradar*.json` configuration semantics, while the internals are
designed for TPU hardware: static shapes, functional transforms, `pjit`
data parallelism over a device mesh, and Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
