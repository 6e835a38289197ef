"""CLI driver — the counterpart of the reference's src/main.py: parse flags,
preset, build the engine for the model family, dispatch experiments.

Run e.g.:
  python -m loco_edit_tpu.cli.main --model_name FFHQ_P2 --dataset_name FFHQ \
      --dataset_root /data/ffhq --checkpoint_path ffhq_p2.pt \
      --run_edit_null_space_projection true --null_space_projection true \
      --edit_t 0.6 --performance_boosting_t 0.2 --use_x_space_guidance true \
      --x_space_guidance_num_step 16 --h_t 0.6
"""

from __future__ import annotations

import os
import sys

import numpy as np


def build_uncond_pipeline(args):
    import jax.numpy as jnp

    from loco_edit_tpu.core.rng import seed_everything
    from loco_edit_tpu.diffusion import LinspaceDDIM
    from loco_edit_tpu.models.registry import load_denoiser
    from loco_edit_tpu.pipelines import UncondEditConfig, UncondEditPipeline

    rng = seed_everything(args.seed)
    denoiser = load_denoiser(args)
    cfg = UncondEditConfig(
        for_steps=args.for_steps,
        inv_steps=args.inv_steps,
        edit_t=args.edit_t,
        performance_boosting_t=args.performance_boosting_t,
        x_space_guidance_scale=args.x_space_guidance_scale,
        x_space_guidance_edit_step=args.x_space_guidance_edit_step,
        x_space_guidance_num_step=args.x_space_guidance_num_step,
        vis_num=args.vis_num,
        vis_num_pc=args.pca_rank,
        pca_rank=args.pca_rank,
        pca_rank_null=args.pca_rank_null,
        null_space_projection=args.null_space_projection,
        encoder_decoder_by_et=args.encoder_decoder_by_et,
        probe_chunk=args.probe_chunk or None,
        result_folder=args.result_folder,
    )
    scheduler = LinspaceDDIM(noise_schedule=args.noise_schedule)
    return UncondEditPipeline(denoiser, cfg, rng, scheduler), denoiser, rng


def get_sample_and_mask(args, denoiser, rng):
    """Resolve the input image (dataset sample or seeded noise) and the edit
    mask (GT semantics / SAM cache / none), mirroring the reference's branches
    (src/modules/edit.py:2234-2267)."""
    from loco_edit_tpu.data import get_dataset

    h, w, c = denoiser.sample_shape
    if args.dataset_name == "Random":
        import jax

        xT = np.asarray(jax.random.normal(
            rng.fork("xT").key, (1, h, w, c), "float32"))
        mask = _sam_mask(args, None) if args.use_mask else None
        return None, xT, mask
    dataset = get_dataset(args.dataset_name, args.dataset_root, args.image_size,
                          save_path=os.path.join(args.result_folder, "dataset"))
    x0 = np.asarray(dataset[args.sample_idx])
    if args.dataset_name == "CelebA_HQ_mask":
        mask = dataset.getmask(args.sample_idx, args.choose_sem) if args.use_mask else None
    else:
        mask = _sam_mask(args, x0) if args.use_mask else None
    return x0, None, mask


def _sam_mask(args, x0):
    """SAM two-phase protocol: --sampling_mode extracts+caches masks then
    exits; the follow-up run selects --mask_index (reference
    src/modules/mask_segmentation.py + edit.py:2237-2247)."""
    mask_path = os.path.join(args.result_folder, f"sample_idx{args.sample_idx}",
                             "mask", "mask.npz")
    if os.path.exists(mask_path):
        with np.load(mask_path) as z:
            masks = z["masks"]
        return masks[args.mask_index][None].astype(bool)
    if args.sampling_mode:
        from loco_edit_tpu.masks.sam import extract_and_cache_masks

        extract_and_cache_masks(args, x0, mask_path)
        print("sampling_mode: masks extracted; rerun with --mask_index")
        sys.exit(0)
    raise FileNotFoundError(
        f"no cached mask at {mask_path}; run once with --sampling_mode true")


def main(argv=None):
    from loco_edit_tpu.cli.args import parse_args, preset

    args = preset(parse_args(argv))

    if args.is_stable_diffusion or args.is_DeepFloyd_IF_diffusion or args.is_LCM:
        raise NotImplementedError(
            "T2I engines (SD / DeepFloyd-IF / LCM) land in the next milestones; "
            "the uncond LOCO-Edit engine is fully wired")

    pipe, denoiser, rng = build_uncond_pipeline(args)

    if args.run_ddim_forward:
        import jax

        h, w, c = denoiser.sample_shape
        xT = np.asarray(jax.random.normal(rng.fork("fwd").key, (5, h, w, c)))
        x0 = pipe.generate(xT, 0, None)
        from loco_edit_tpu.utils.io import save_image_grid

        save_image_grid(np.asarray(x0),
                        os.path.join(args.result_folder, "DDIMforward.png"))

    if args.run_ddim_inversion:
        x0, _, _ = get_sample_and_mask(args, denoiser, rng)
        xT = pipe.invert(x0)
        from loco_edit_tpu.utils.io import save_image_grid

        save_image_grid(np.asarray(xT),
                        os.path.join(args.result_folder, "DDIMinversion.png"))

    if args.run_edit_null_space_projection:
        x0, xT, mask = get_sample_and_mask(args, denoiser, rng)
        pipe.run_edit_null_space_projection(
            x0=x0, xT=xT, mask=mask,
            sample_name=f"sample_idx{args.sample_idx}",
            vT_path=args.vT_path or None, random_edit=args.random_edit)

    if args.group_edit_null_space_projection:
        x0, xT, mask = get_sample_and_mask(args, denoiser, rng)
        if xT is None:
            xT = np.asarray(pipe.invert(x0))
        pipe.group_edit(xT, [args.vT_path, args.vT1_path],
                        sample_name=f"sample_idx{args.sample_idx}")


if __name__ == "__main__":
    main()
