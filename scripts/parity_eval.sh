#!/usr/bin/env bash
# BASELINE.md protocol 3 in one command: edit the canonical CelebA-HQ samples
# (idx 3456 hair / 4729 l_eye, rank-5 @0.6T, null-proj, scale 0.5 x 16) and
# report SSIM / off-mask MSE (edit locality) — plus SSIM/LPIPS against the
# PyTorch reference outputs when REFERENCE_DIR points at its PNGs
# (named <idx>_<sem>.png).
python -m loco_edit_tpu.cli.parity_eval \
    --model_name CelebA_HQ_HF --dataset_name CelebA_HQ_mask \
    --checkpoint_path "${CELEBA_HQ_CKPT:?set CELEBA_HQ_CKPT}" \
    --dataset_root "${CELEBA_MASK_ROOT:?set CELEBA_MASK_ROOT}" \
    --reference_dir "${REFERENCE_DIR:-}" \
    --sample_specs "3456:hair,4729:l_eye" "$@"
