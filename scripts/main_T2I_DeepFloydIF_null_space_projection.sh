#!/usr/bin/env bash
# T-LOCO on DeepFloyd-IF stage 1 (reference main_T2I_DeepFloydIF_*.sh).
python -m loco_edit_tpu.cli.main \
    --sh_file_name scripts/main_T2I_DeepFloydIF_null_space_projection.sh \
    --model_name DeepFloyd-IF-I-M --dataset_name Random \
    --checkpoint_path "${IF_UNET_CKPT:-}" --text_encoder_path "${IF_T5_DIR:-}" \
    --for_prompt "A photo of a man" --edit_prompt "A photo of a man wearing glasses" \
    --guidance_scale 7.0 --guidance_scale_edit 4.0 \
    --for_steps 100 --edit_t 0.75 --performance_boosting_t 0 \
    --x_space_guidance_scale 1.0 --x_space_guidance_num_step 4 \
    --run_edit_null_space_projection_xt_semantic true \
    --null_space_projection true --pca_rank 1 --pca_rank_null 5 \
    --tilda_v_score_type "(for-edit)-direct" --jacobian false \
    --mask_type "${MASK_TYPE:-SAM}" \
    --mask_index "${MASK_INDEX:-0}" --sampling_mode "${SAMPLING_MODE:-false}" \
    --seed 1 --vis_num 2
