#!/usr/bin/env bash
# CPU-runnable smoke of the T2I CLI paths (tiny random-init models, fake
# prompt encoder, no masks): the two nonsemantic scripts with reduced steps.
set -e
cd "$(dirname "$0")/.."
export LOCO_SD_PRESET=tiny
# LOCO_PLATFORM (not JAX_PLATFORMS): the axon TPU plugin claims the latter
export LOCO_PLATFORM=cpu
bash scripts/main_T2I_LCM_null_space_projection_nonsemantic.sh \
    --use_mask false --null_space_projection false \
    --x_space_guidance_num_step 4 --pca_rank 1 --pca_rank_null 1 "$@"
bash scripts/main_T2I_DeepFloydIF_null_space_projection_nonsemantic.sh \
    --use_mask false --null_space_projection false --for_steps 8 \
    --x_space_guidance_num_step 4 --pca_rank 1 --pca_rank_null 1 "$@"
echo "T2I smoke OK"
