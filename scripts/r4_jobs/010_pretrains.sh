#!/bin/bash
# TPU-queue job: regenerate the pretrained tables for both campaign roots
# (the /tmp wipe took pre.npz with it; the pretrain protocol is
# deterministic — round-3 verified the regenerated metrics match the
# recorded ones exactly). Waits for the CPU gen lanes' done markers.
set -u
cd /root/repo
for m in /tmp/gen_yelp_done /tmp/gen_adressa_done; do
  for i in $(seq 1 240); do [ -f "$m" ] && break; sleep 20; done
  [ -f "$m" ] || { echo "TIMEOUT waiting for $m"; exit 1; }
done
[ -f /tmp/yelp_scale_r2/synth/information.npy ] || { echo "yelp gen missing"; exit 1; }
[ -f /tmp/adressa_r3/news/information.npy ] || { echo "adressa gen missing"; exit 1; }
timeout 2400 python scripts/yelp_scale_sweep.py --phase pretrain --root /tmp/yelp_scale_r2
echo "yelp pretrain rc=$?"
timeout 2400 python scripts/adressa_run.py --phase pretrain --root /tmp/adressa_r3
echo "adressa pretrain rc=$?"
python3 - <<'EOF'
import json
for p in ("/tmp/yelp_scale_r2/results.json", "/tmp/adressa_r3/results.json"):
    d = json.load(open(p))
    print(p, "pretrain:", d.get("pretrain"))
EOF
touch /tmp/pretrains_done
