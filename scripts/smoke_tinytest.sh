#!/usr/bin/env bash
# CPU-runnable smoke of the full CLI path on the 32px TinyTest model.
# LOCO_PLATFORM (not JAX_PLATFORMS): the axon TPU plugin claims the latter.
export LOCO_PLATFORM=${LOCO_PLATFORM:-cpu}
python -m loco_edit_tpu.cli.main \
    --model_name TinyTest --dataset_name Random \
    --for_steps 10 --inv_steps 10 --edit_t 0.6 --performance_boosting_t 0.2 \
    --x_space_guidance_scale 0.5 --x_space_guidance_num_step 4 \
    --pca_rank 2 --pca_rank_null 2 --vis_num 2 \
    --null_space_projection false --use_mask false \
    --run_edit_null_space_projection true --seed 7 "$@"
