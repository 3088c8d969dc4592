#!/bin/bash
# Evaluation counterpart (reference slurm_test.sh): restores the BEST
# checkpoint and runs the validation + test metric passes.
#SBATCH --job-name=mask_bev_tpu_test
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=8
#SBATCH --time=12:00:00
#SBATCH --output=logs/%x-%j.out

set -euo pipefail
CONFIG=${1:?usage: sbatch slurm_test.sh configs/<exp>.yml [data_root]}
DATA_ROOT=${2:-data}
srun python train_mask_bev.py --config "$CONFIG" --data-root "$DATA_ROOT" --test
