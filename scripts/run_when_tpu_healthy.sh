#!/bin/bash
# Poll the relayed TPU until a trivial jit+readback completes, then exec the
# given command. The tunnel's known degradation mode (CLAUDE.md) can last
# hours; this keeps the queue moving unattended.
# Usage: bash scripts/run_when_tpu_healthy.sh <command...>
set -u
cd "$(dirname "$0")/.."
while true; do
  # 240s: on a degraded-but-recovering relay the trivial first compile has
  # been observed at 40-140s; 120s rejected a usable tunnel (round 4).
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print(float((x @ x).sum()))" >/dev/null 2>&1; then
    echo "[$(date +%H:%M:%S)] TPU healthy — launching: $*"
    exec "$@"
  fi
  echo "[$(date +%H:%M:%S)] TPU still degraded; retrying in 180s"
  sleep 180
done
