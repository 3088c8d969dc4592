#!/bin/bash
# SLURM launcher for TPU-host training (counterpart of the reference's
# slurm_train.sh:1-27, which ran docker on a GPU node). Adjust partition /
# account / walltime to your site; one task per TPU host.
#SBATCH --job-name=mask_bev_tpu
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=16
#SBATCH --time=4-00:00
#SBATCH --output=logs/%x-%j.out

set -euo pipefail
CONFIG=${1:?usage: sbatch slurm_train.sh configs/<exp>.yml [data_root]}
DATA_ROOT=${2:-data}

# multi-host TPU slices: export these from your scheduler/TPU metadata
#   JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID
# (consumed via mask_bev_tpu.parallel.mesh.init_distributed)

srun python train_mask_bev.py --config "$CONFIG" --data-root "$DATA_ROOT" --train
