"""g4splat_tpu — a TPU-native sparse-view 3D scene reconstruction framework.

Rebuilds the capabilities of DaLi-Jack/G4Splat (geometry-guided 2D Gaussian
splatting with generative priors) from scratch on JAX/XLA/Pallas:

- ``core``     cameras, quaternions, spherical harmonics, depth/normal geometry
- ``ops``      differentiable surfel rasterization (dense oracle, tiled JAX,
               Pallas TPU kernels), knn, tsdf, marching tetrahedra
- ``models``   Gaussian surfel scene state (static-capacity pytrees), PLY IO
- ``train``    2DGS training loop: losses, densification, optimizers
- ``priors``   JAX ports of prior networks (DepthAnythingV2, MASt3R, SAM, See3D)
- ``pipeline`` in-process stage graph replacing the reference's subprocess chain
- ``parallel`` jax.sharding Mesh helpers (data-parallel cameras, sharded splats)
- ``io``       COLMAP / PLY / npz artifact store (reference-compatible layouts)
"""

__version__ = "0.1.0"
