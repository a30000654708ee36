#!/usr/bin/env bash
# Slurm eval wrapper (reference tools/slurm_test.sh surface). Evaluation
# runs SPMD from one process per host over the global mesh.
# Usage: GPUS=<hosts> ./tools/slurm_test.sh PARTITION JOB_NAME CONFIG CKPT [args...]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
HOSTS=${GPUS:-${HOSTS:-1}}
CPUS_PER_TASK=${CPUS_PER_TASK:-16}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:5}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${HOSTS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/test.py ${CONFIG} ${CHECKPOINT} ${PY_ARGS}
