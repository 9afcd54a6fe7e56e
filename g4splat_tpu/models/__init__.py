from g4splat_tpu.models.gaussians import GaussianScene
