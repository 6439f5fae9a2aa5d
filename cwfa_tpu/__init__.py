"""cwfa_tpu — a TPU-native framework for Conditional Wavelet Flow XLFM reconstruction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of pvjosue/CWFA
(Conditional Wavelet Flow Architecture for 3D reconstruction of XLFM light-field
microscopy images, arXiv 2306.06408).  The reference is a single-GPU PyTorch
research codebase; this package is a TPU-first redesign:

- the invertible-flow runtime is a library of *pure functions*
  ``apply(params, x, cond, rev) -> (y, logdet)`` composed statically and
  compiled with ``jax.jit`` (no graph interpreter — the CWF step graph is
  statically known, see reference ``FrEIA/framework/graph_inn.py``);
- hot element-wise chains (depth-axis Haar butterfly fused with the affine
  coupling) are hand-written Pallas TPU kernels (``cwfa_tpu.ops.pallas_haar``);
- convolutional subnets (condition networks, wavelet-flow subnets, the LRNN
  U-Net) lower through XLA with bf16 compute / fp32 accumulation;
- scaling is expressed with ``jax.sharding`` meshes (data, and spatial axes)
  instead of the reference's single-device design.

Subpackages
-----------
flow      invertible ops: Haar1D, couplings (CAT/RNVP/GLOW/GIN/NICE/AllInOne),
          permutations, ActNorm, step composition
models    CWF step + full CWFA model, condition nets, LRNN/U-Net, XLFMNet
ops       Pallas kernels, FFT convolution, Richardson–Lucy deconvolution
data      XLFM datasets, lenslet view extraction, statistics, PSF/OTF
engine    trainer (coarse-to-fine stage schedule), losses, metrics,
          checkpoints, OOD detection + finetune
parallel  device meshes and sharding plans
utils     projections/visualisation, seeding, logging
"""

__version__ = "0.1.0"
