#!/usr/bin/env bash
# Tunnel-health watcher (round-5): the axon tunnel stalled at 07:40Z and
# hung the b512_horizon run mid-dispatch (100% iowait, zero CPU on the
# client).  Poll a tiny bounded TPU dispatch until it completes, then
# hand the chip straight to the desaturation ladder so no healthy chip
# time is wasted.
set -u
cd "$(dirname "$0")/.."

while true; do
  if timeout -s KILL 90 python - <<'EOF' >/dev/null 2>&1
import jax, numpy as np
x = jax.numpy.ones((128, 128))
v = float(np.asarray(jax.device_get((x @ x)[0, 0])))
assert v == 128.0
EOF
  then
    echo "$(date -u +%H:%M:%S) chip healthy — starting ladder"
    break
  fi
  echo "$(date -u +%H:%M:%S) tunnel still down"
  sleep 120
done
exec bash scripts/r5_edb2_probes.sh
