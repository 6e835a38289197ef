#!/usr/bin/env bash
# Metface_P2 + SAM masks (reference scripts/main_hf_null_space_projection_*.sh).
# Phase 1: SAMPLING_MODE=true extracts masks; phase 2 picks MASK_INDEX.
for sample_idx in "$@"; do
python -m loco_edit_tpu.cli.main \
    --sh_file_name scripts/$(basename "$0") \
    --sample_idx $sample_idx --dtype fp32 --seed 1 \
    --model_name Metface_P2 --dataset_name Metface \
    --dataset_root "" \
    --checkpoint_path "${CKPT:-}" \
    --mask_model_name facebook/sam-vit-large --mask_type SAM \
    --for_steps 100 --inv_steps 100 --use_yh_custom_scheduler true \
    --x_space_guidance_edit_step 1 --x_space_guidance_scale "${SCALE:-12.0}" \
    --x_space_guidance_num_step "${NUM_STEP:-1}" \
    --edit_t "${EDIT_T:-0.2}" --performance_boosting_t 0.2 \
    --run_edit_null_space_projection true --note "Uncond" \
    --null_space_projection true --pca_rank_null 5 --pca_rank 3 \
    --mask_index "${MASK_INDEX:-0}" --sampling_mode "${SAMPLING_MODE:-false}" \
    --vis_num 2
done
