"""On-chip shard_map DP smoke with the PALLAS backend.

Runs the data-parallel training step (grads pmean'd over the mesh) with
backend="pallas" on a 1-device mesh on the real TPU chip — proving the
Pallas custom_vjp kernels compile and execute under shard_map (the CPU
dryrun exercises the same path in interpret mode on an 8-device mesh;
tests/test_parallel.py::test_dp_train_step_pallas_interpret).

Prints one OK line with the loss and parameter delta; commit the tail.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_problem
    from g4splat_tpu.parallel.mesh import (
        data_parallel_train_step, make_mesh, replicate, shard_batch)
    from g4splat_tpu.train.trainer import (
        TrainConfig, make_optimizer, scene_params)

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)
    mesh = make_mesh(n_data=1, devices=[dev])
    # Non-toy shapes: 20k splats, 128px, 4 views on the single-chip mesh.
    scene, cameras, views = _tiny_problem(
        n_gauss=20_000, n_views=4, res=128, capacity=32_768)
    cfg = TrainConfig(
        use_mip_filter=False, use_depth_order=False, backend="pallas",
        lambda_dist=10.0, distortion_from=0, normal_consistency_from=0,
    )
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(scene_params(scene))
    scene_r = replicate(mesh, scene)
    opt_state = replicate(mesh, opt_state)
    cameras = shard_batch(mesh, cameras)
    views["scale_factor"] = jnp.full((4,), 10.0)
    views = shard_batch(mesh, views)

    step = data_parallel_train_step(mesh, cfg, optimizer)
    t0 = time.time()
    scene2, opt_state2, loss = step(
        scene_r, opt_state, cameras, views, jnp.asarray(1),
        jax.random.PRNGKey(0))
    loss = float(loss)
    dt = time.time() - t0
    delta = float(jnp.abs(scene2.xyz - scene_r.xyz).max())
    assert np.isfinite(loss), loss
    assert delta > 0
    # steady-state step time
    t0 = time.time()
    for _ in range(5):
        scene2, opt_state2, loss2 = step(
            scene2, opt_state2, cameras, views, jnp.asarray(1),
            jax.random.PRNGKey(1))
    jax.block_until_ready(scene2.xyz)
    step_ms = (time.time() - t0) / 5 * 1e3
    print(f"pallas-under-mesh OK: loss={loss:.4f} dxyz={delta:.2e} "
          f"compile+first={dt:.1f}s steady={step_ms:.1f} ms/step "
          f"(20k splats, 4x128px views, 1-device mesh, shard_map DP)",
          flush=True)


if __name__ == "__main__":
    main()
