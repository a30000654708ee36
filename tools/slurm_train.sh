#!/usr/bin/env bash
# Slurm launch wrapper (reference tools/slurm_train.sh surface).
# TPU-native model: one python process PER HOST (not per device); each
# task joins the global mesh via jax.distributed using the slurm rank.
# Usage: GPUS=<hosts> ./tools/slurm_train.sh PARTITION JOB_NAME CONFIG [args...]
export MASTER_PORT=${MASTER_PORT:-$((12000 + $RANDOM % 20000))}
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
HOSTS=${GPUS:-${HOSTS:-1}}
CPUS_PER_TASK=${CPUS_PER_TASK:-16}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:4}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${HOSTS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    bash -c 'python -u tools/train.py '"${CONFIG}"' \
        --coordinator ${SLURMD_NODENAME:-127.0.0.1}:'"${MASTER_PORT}"' \
        --num-hosts '"${HOSTS}"' --host-id ${SLURM_PROCID} '"${PY_ARGS}"
