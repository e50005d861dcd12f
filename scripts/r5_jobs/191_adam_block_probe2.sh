#!/bin/bash
cd /root/repo
timeout 1200 python - <<'PYEOF'
import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from sml_tpu.ops.adam_kernel import fused_decay_adam

rows, d = 6_000_000, 64
bc1 = jnp.float32(0.9); bc2 = jnp.float32(0.99)
for blk in (1024, 2048):
    p = jnp.asarray(np.random.default_rng(0).standard_normal((rows, d)), jnp.float32)
    mu = jnp.zeros_like(p); nu = jnp.ones_like(p)
    try:
        args = dict(lr=0.01, b1=0.9, b2=0.999, eps=1e-8, block_rows=blk)
        p, mu, nu = fused_decay_adam(p, mu, nu, bc1, bc2, **args)
        float(p[0, 0])
        best = 1e9
        for _ in range(9):
            t0 = time.time()
            p, mu, nu = fused_decay_adam(p, mu, nu, bc1, bc2, **args)
            float(p[0, 0])
            best = min(best, time.time() - t0)
        gb = rows * d * 4 * 6 / 1e9
        print(f"block={blk}: {best*1e3:.1f} ms -> {gb/best:.0f} GB/s", flush=True)
    except Exception as e:
        print(f"block={blk}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
    del p, mu, nu
PYEOF
echo rc=$?
