"""lerf_tpu — a TPU-native framework for learned steerable image resampling.

Re-implements the complete capability surface of LeRF (Learning Resampling
Function, CVPR'23 / T-PAMI'25; reference implementation ddlee-cn/LeRF-PyTorch)
as an idiomatic JAX/XLA/Pallas framework:

  * steerable (anisotropic-Gaussian / amplified-linear) arbitrary-scale
    resizing and homographic warping  (``lerf_tpu.ops``)
  * fixed-kernel interpolation library (cubic/linear/box/lanczos)
  * 4D-LUT runtime with branchless simplex interpolation and the
    rotation/mode ensemble expressed as static shifted slices
  * model zoo (SRNet micro-nets as MXU matmuls, IMDN for LeRF-Net/Net++)
  * LUT transfer + fine-tuning, training loop with pjit data-parallelism,
    orbax checkpointing, metrics, CLI drivers, benchmark datasets.

Design notes: all hot paths are pure jittable functions with static shapes;
geometry precompute happens host-side in float64 (bit-parity with the
reference's numpy deploy path); integer LUT arithmetic is bit-exact.
"""

__version__ = "0.1.0"
