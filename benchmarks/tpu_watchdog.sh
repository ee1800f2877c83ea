#!/bin/bash
# Wait until the tunneled TPU answers a trivial matmul within 90 s, then
# run the remaining campaign.  Retries the probe every 5 minutes.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_campaign}
mkdir -p "$LOG"

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512))
print(float((x @ x).sum()))
" >/dev/null 2>&1
}

n=0
until probe; do
  n=$((n + 1))
  echo "$(date +%H:%M:%S) probe $n failed; chip busy/wedged, waiting 300s" \
    >>"$LOG/watchdog.log"
  sleep 300
done
echo "$(date +%H:%M:%S) chip healthy after $n failed probes; launching" \
  >>"$LOG/watchdog.log"
exec bash benchmarks/run_rest_tpu.sh "$LOG"
