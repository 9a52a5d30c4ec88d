#!/bin/bash
# Poll the axon tunnel (port 8113); when it accepts connections, run the
# queued on-chip A/Bs (tools/run_r3_pending.sh) once and exit.
# Usage: nohup bash tools/watch_tunnel.sh > /tmp/watch_tunnel.log 2>&1 &
cd "$(dirname "$0")/.."
while true; do
  if timeout 5 bash -c 'cat < /dev/null > /dev/tcp/localhost/8113' 2>/dev/null; then
    echo "$(date -Is) tunnel port open; confirming with a device query"
    if timeout 300 python -c "import jax; print(jax.devices())"; then
      echo "$(date -Is) chip reachable; running pending queue"
      bash tools/run_r3_pending.sh 2>&1 | tee /tmp/r3_pending.log
      echo "$(date -Is) pending queue done"
      exit 0
    fi
  fi
  sleep 60
done
