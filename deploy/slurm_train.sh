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

# multi-host TPU slices: one srun task per host; train_mask_bev.py calls
# mask_bev_tpu.parallel.mesh.maybe_init_distributed_from_env, which reads
# SLURM_NTASKS / SLURM_PROCID plus the coordinator below (task 0's host)
export MASKBEV_COORDINATOR=${MASKBEV_COORDINATOR:-"$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1):8476"}

srun python train_mask_bev.py --config "$CONFIG" --data-root "$DATA_ROOT" --train
