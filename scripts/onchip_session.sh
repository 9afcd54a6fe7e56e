#!/bin/bash
# One serialized TPU session: parity gate -> kernel timings -> bench.
# (One TPU client at a time; the tunnel wedges under concurrent clients.)
# Streams to /tmp/onchip.log so progress is visible while running.
set -x
cd /root/repo
exec > >(tee /tmp/onchip.log) 2>&1
python - <<'EOF'
# Tunnel probe: tiny matmul + host read; hangs if the tunnel is wedged.
import numpy as np, jax, jax.numpy as jnp, time
t0 = time.time()
x = jnp.ones((256, 256))
y = np.asarray(x @ x)
print(f"probe OK ({time.time()-t0:.1f}s, {jax.devices()})", flush=True)
EOF
python scripts/check_pallas.py
python scripts/profile_render.py quick
python bench.py
python scripts/sweep_fwd.py
