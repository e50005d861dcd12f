#!/bin/bash
# TPU-queue job: measure the axon tunnel's host->device and device->host
# bandwidth + dispatch latency. The eval sets are ~60 MB/period uint16
# uploads; if the tunnel moves ~10-30 MB/s the test span's wall-clock is
# upload-bound and the BASELINE.md perf story should say so explicitly.
set -u
cd /root/repo
timeout 900 python - <<'EOF' > /tmp/tunnel_bw_r3.json
import json, time
import numpy as np
import jax, jax.numpy as jnp

out = {"backend": jax.default_backend()}
# dispatch latency: tiny op, sync each time
x = jnp.zeros((8, 8)); f = jax.jit(lambda a: a + 1)
np.asarray(f(x))
t0 = time.time()
for _ in range(20):
    np.asarray(f(x))
out["roundtrip_ms"] = (time.time() - t0) / 20 * 1e3

for mb in (16, 64):
    a = np.random.randint(0, 60000, (mb * 1024 * 1024 // 2,), np.uint16)
    d = jax.device_put(a); np.asarray(d[:1])      # warm path
    t0 = time.time()
    d = jax.device_put(a); np.asarray(d[:1])
    dt = time.time() - t0
    out[f"h2d_{mb}mb_MBps"] = mb / dt
    t0 = time.time()
    _ = np.asarray(d)
    out[f"d2h_{mb}mb_MBps"] = mb / (time.time() - t0)
print(json.dumps(out, indent=1))
EOF
echo rc=$?
cat /tmp/tunnel_bw_r3.json
