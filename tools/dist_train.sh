#!/usr/bin/env bash
# Multi-process training launcher — the equivalent of the reference's
# tools/dist_train.sh (torch.distributed.launch NNODES/NODE_RANK/
# MASTER_ADDR wrapper). Spawns NPROCS local worker processes that join
# one jax.distributed job via the MVSDET_* env contract
# (mvsdet_tpu/parallel/multihost.py); on a real multi-host TPU pod set
# MVSDET_COORDINATOR to the host-0 address and run one invocation per
# host with MVSDET_PROCESS_ID set to the host index.
#
# Usage: tools/dist_train.sh NPROCS [train.py args...]
#   e.g. tools/dist_train.sh 2 --synthetic 4 --steps 20 --data-parallel 2
set -euo pipefail
NPROCS=${1:?usage: dist_train.sh NPROCS [train.py args...]}
shift
PORT=${MVSDET_PORT:-12355}
COORD=${MVSDET_COORDINATOR:-127.0.0.1:$PORT}
DIR=$(cd "$(dirname "$0")" && pwd)

pids=()
for ((i = 0; i < NPROCS; i++)); do
  MVSDET_COORDINATOR=$COORD \
  MVSDET_NUM_PROCESSES=$NPROCS \
  MVSDET_PROCESS_ID=$i \
  python "$DIR/train.py" "$@" &
  pids+=($!)
done
# Fail fast: if any worker dies, kill the rest immediately instead of
# letting them block in jax.distributed collectives until the
# distributed-service timeout.
rc=0
remaining=$NPROCS
while ((remaining > 0)); do
  set +e
  wait -n   # reap whichever worker exits next
  st=$?
  set -e
  if ((st != 0 && rc == 0)); then
    rc=$st
    kill "${pids[@]}" 2>/dev/null || true
  fi
  remaining=$((remaining - 1))
done
exit $rc
