#!/usr/bin/env bash
# T-LOCO on DeepFloyd-IF stage 1, UNSUPERVISED (power-iteration directions,
# --jacobian + non-semantic run_edit_null_space_projection_xt) — mirrors the
# reference main_T2I_DeepFloydIF_null_space_projection_nonsemantic.sh.
python -m loco_edit_tpu.cli.main \
    --sh_file_name scripts/main_T2I_DeepFloydIF_null_space_projection_nonsemantic.sh \
    --model_name DeepFloyd-IF-I-M --dataset_name Random \
    --checkpoint_path "${IF_UNET_CKPT:-}" \
    --stage2_checkpoint_path "${IF_STAGE2_CKPT:-}" \
    --text_encoder_path "${IF_T5_DIR:-}" \
    --for_prompt "A photo of a man" \
    --edit_prompt "A photo of a man wearing glasses" \
    --guidance_scale 15.0 --guidance_scale_edit 15.0 \
    --for_steps 100 --edit_t 0.75 --performance_boosting_t 0 \
    --x_space_guidance_scale 0.2 --x_space_guidance_num_step 64 \
    --run_edit_null_space_projection_xt true \
    --null_space_projection true --pca_rank 5 --pca_rank_null 5 \
    --tilda_v_score_type "null+(for-null)+(edit-null)" --jacobian true \
    --ablation_method "null-space-proj" --mask_type "${MASK_TYPE:-SAM}" \
    --mask_index "${MASK_INDEX:-1}" --sampling_mode "${SAMPLING_MODE:-false}" \
    --note "nonsemantic" --seed 0 --vis_num 1 "$@"
