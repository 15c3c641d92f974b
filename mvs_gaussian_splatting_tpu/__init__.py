"""mvs_gaussian_splatting_tpu — a TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ChikaYan/mvs_gaussian_splatting (a fork of graphdeco-inria 3D Gaussian
Splatting with learnable-densification research extensions):

- ``utils``    — pure math: camera transforms, SH, quaternions, losses, schedules.
- ``ops``      — the differentiable rasterizer: vectorized preprocess, tile
  binning via XLA sort, per-tile alpha compositing (pure-jnp oracle + Pallas
  TPU kernels), and k-NN init distances.
- ``models``   — Gaussian parameter pytrees with fixed-capacity padded storage
  + alive masks (the XLA-friendly replacement for the reference's tensor-shape
  surgery), densification/pruning as pure functions, PLY interchange I/O.
- ``train``    — config dataclasses, per-group Adam via optax, training loop.
- ``data``     — COLMAP / Blender scene loaders, camera objects.
- ``parallel`` — jax.sharding Mesh setup and sharded train/render steps.
- ``eval``     — SSIM/PSNR/LPIPS metrics drivers.
- ``toy2d``    — the single-image 2D Gaussian fit conformance target.
- ``viewer``   — network GUI protocol server.

Design notes: everything in the compute path is functional and jit-compiled;
point counts are capacity-padded with alive masks so densification never
changes array shapes (recompiles only on capacity growth); multi-device
scaling uses jax.sharding + shard_map over (data, tile) mesh axes.
"""

__version__ = "0.1.0"
