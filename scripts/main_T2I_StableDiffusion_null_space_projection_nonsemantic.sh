#!/usr/bin/env bash
# T-LOCO on SD 2.1-base, unsupervised power iteration.
python -m loco_edit_tpu.cli.main \
    --sh_file_name scripts/main_T2I_StableDiffusion_null_space_projection_nonsemantic.sh \
    --model_name stable-diffusion-2-1-base --dataset_name Random \
    --checkpoint_path "${SD_UNET_CKPT:-}" --vae_path "${SD_VAE_CKPT:-}" \
    --text_encoder_path "${SD_TEXT_DIR:-}" \
    --for_prompt "A photo of a man" --edit_prompt "" \
    --guidance_scale 7.5 --for_steps 100 --inv_steps 100 --edit_t 0.7 \
    --performance_boosting_t 0 \
    --x_space_guidance_scale 2.0 --x_space_guidance_num_step 8 \
    --run_edit_null_space_projection_zt true \
    --null_space_projection true --pca_rank 2 --pca_rank_null 5 \
    --mask_index "${MASK_INDEX:-0}" --sampling_mode "${SAMPLING_MODE:-false}" \
    --seed 1 --vis_num 2
