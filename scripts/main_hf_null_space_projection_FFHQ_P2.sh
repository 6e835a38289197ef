#!/usr/bin/env bash
# FFHQ P2-weighting DDPM + SAM masks (reference scripts/main_hf_null_space_projection_FFHQ_P2.sh).
# Two-phase: first run with --sampling_mode true to extract SAM masks, then
# rerun with --mask_index picked from the overlays.
for sample_idx in "$@"; do
python -m loco_edit_tpu.cli.main \
    --sh_file_name scripts/main_hf_null_space_projection_FFHQ_P2.sh \
    --sample_idx $sample_idx --dtype fp32 --seed 1 \
    --model_name FFHQ_P2 --dataset_name FFHQ \
    --dataset_root "${FFHQ_ROOT:?set FFHQ_ROOT}" \
    --checkpoint_path "${FFHQ_P2_CKPT:-}" \
    --mask_model_name facebook/sam-vit-large --mask_type SAM \
    --for_steps 100 --inv_steps 100 --use_yh_custom_scheduler true \
    --x_space_guidance_edit_step 1 --x_space_guidance_scale 12.0 \
    --x_space_guidance_num_step 1 \
    --edit_t 0.2 --performance_boosting_t 0.2 \
    --run_edit_null_space_projection true --note "Uncond" \
    --null_space_projection true --pca_rank_null 5 --pca_rank 3 \
    --mask_index "${MASK_INDEX:-0}" --sampling_mode "${SAMPLING_MODE:-false}" \
    --vis_num 2
done
