#!/usr/bin/env bash
# T-LOCO on LCM Dreamshaper v7, UNSUPERVISED (non_semantic: power-iteration
# directions instead of prompt deltas) — mirrors the reference
# main_T2I_LCM_null_space_projection_nonsemantic.sh.
python -m loco_edit_tpu.cli.main \
    --sh_file_name scripts/main_T2I_LCM_null_space_projection_nonsemantic.sh \
    --model_name LCM_Dreamshaper_v7 --dataset_name Random \
    --checkpoint_path "${LCM_UNET_CKPT:-}" --vae_path "${LCM_VAE_CKPT:-}" \
    --text_encoder_path "${LCM_TEXT_DIR:-}" \
    --for_prompt "A photo of a man" \
    --edit_prompt "A photo of a man having curly hair" \
    --guidance_scale 7.5 --guidance_scale_edit 7.5 \
    --num_inference_steps 4 --edit_t_idx 2 \
    --x_space_guidance_scale 0.4 --x_space_guidance_num_step 24 \
    --run_edit_null_space_projection_zt true \
    --null_space_projection true --pca_rank 5 --pca_rank_null 5 \
    --tilda_v_score_type "null+(for-null)+(edit-null)" \
    --non_semantic true --use_yh_custom_scheduler false \
    --mask_index "${MASK_INDEX:-5}" --sampling_mode "${SAMPLING_MODE:-false}" \
    --note "nonsemantic" --seed 0 --vis_num 1 --dtype fp32 "$@"
