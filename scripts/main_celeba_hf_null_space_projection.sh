#!/usr/bin/env bash
# Flagship LOCO-Edit config (reference scripts/main_celeba_hf_null_space_projection.sh):
# CelebAMask-HQ GT-mask edit on the HF CelebA-HQ DDPM, rank-1 basis @0.6T,
# null-space rank 5, scale 0.5 x 16 steps.
# Checkpoint: local torch .pt/.bin (diffusers or SDEdit naming) via --checkpoint_path.
for sample_idx in 4729; do
python -m loco_edit_tpu.cli.main \
    --sh_file_name      scripts/main_celeba_hf_null_space_projection.sh \
    --sample_idx        $sample_idx \
    --dtype             fp32 \
    --seed              1 \
    --model_name        CelebA_HQ_HF \
    --dataset_name      CelebA_HQ_mask \
    --checkpoint_path   "${CELEBA_HQ_CKPT:-}" \
    --for_steps 100 --inv_steps 100 --use_yh_custom_scheduler true \
    --x_space_guidance_edit_step 1 --x_space_guidance_scale 0.5 \
    --x_space_guidance_num_step 16 \
    --edit_t 0.6 --performance_boosting_t 0.2 \
    --run_edit_null_space_projection true \
    --dataset_root "${CELEBA_MASK_ROOT:?set CELEBA_MASK_ROOT}" \
    --choose_sem "l_eye" \
    --null_space_projection true --use_mask true \
    --pca_rank_null 5 --pca_rank 1 --vis_num 2
done
# direction transfer: add --vT_path runs/.../pc_000-vT.npz
# known-good (sample_idx, choose_sem): (3456,hair) (4729,l_eye) (2984,hair) (3638,l_eye)
