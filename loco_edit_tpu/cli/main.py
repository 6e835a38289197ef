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
    if args.mesh_sp > 1:
        import dataclasses

        from loco_edit_tpu.parallel.sp import make_sp_mesh, sp_denoiser

        denoiser = dataclasses.replace(
            denoiser, eps_fn=sp_denoiser(denoiser.eps_fn,
                                         make_sp_mesh(args.mesh_sp)))
    cfg = UncondEditConfig(
        for_steps=args.for_steps,
        inv_steps=args.inv_steps,
        inv_refine_steps=args.inv_refine_steps,
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
        mesh_probe=args.mesh_probe,
        mesh_data=args.mesh_data,
        memory_bound=args.memory_bound,
        pixel_output=args.pixel_output,
        result_folder=args.result_folder,
    )
    scheduler = LinspaceDDIM(noise_schedule=args.noise_schedule)
    return UncondEditPipeline(denoiser, cfg, rng, scheduler), denoiser, rng


def get_sample_and_mask(args, pipe, denoiser, rng):
    """Resolve the input image (dataset sample or seeded noise) and the edit
    mask (GT semantics / SAM cache / none), mirroring the reference's branches
    (src/modules/edit.py:2234-2267)."""
    from loco_edit_tpu.data import get_dataset

    h, w, c = denoiser.sample_shape
    if args.dataset_name == "Random":
        import jax

        xT = np.asarray(jax.random.normal(
            rng.fork("xT").key, (1, h, w, c), "float32"))
        # SAM needs a decoded image: denoise xT to x0 lazily (only when the
        # mask cache is cold) rather than handing SAM a None image.
        mask = _sam_mask(args, None,
                         make_image=lambda: np.asarray(pipe.generate(xT, 0, None))
                         ) if args.use_mask else None
        return None, xT, mask
    dataset = get_dataset(args.dataset_name, args.dataset_root, args.image_size,
                          save_path=os.path.join(args.result_folder, "dataset"))
    x0 = np.asarray(dataset[args.sample_idx])
    if args.dataset_name == "CelebA_HQ_mask":
        mask = dataset.getmask(args.sample_idx, args.choose_sem) if args.use_mask else None
    else:
        mask = _sam_mask(args, x0) if args.use_mask else None
    return x0, None, mask


def _sam_mask(args, x0, make_image=None):
    """SAM two-phase protocol: --sampling_mode extracts+caches masks then
    exits; the follow-up run selects --mask_index (reference
    src/modules/mask_segmentation.py + edit.py:2237-2247). make_image supplies
    a generated sample lazily when x0 is None (the Random-dataset case)."""
    mask_path = os.path.join(args.result_folder, f"sample_idx{args.sample_idx}",
                             "mask", "mask.npz")
    if os.path.exists(mask_path):
        with np.load(mask_path) as z:
            masks = z["masks"]
        return masks[args.mask_index][None].astype(bool)
    if args.sampling_mode:
        from loco_edit_tpu.masks.sam import extract_and_cache_masks

        if x0 is None:
            if make_image is None:
                raise ValueError("Random + SAM needs a generated image; none available")
            x0 = make_image()
        extract_and_cache_masks(args, x0, mask_path)
        print("sampling_mode: masks extracted; rerun with --mask_index")
        sys.exit(0)
    raise FileNotFoundError(
        f"no cached mask at {mask_path}; run once with --sampling_mode true")


def main(argv=None):
    from loco_edit_tpu.cli.args import parse_args, preset
    from loco_edit_tpu.core.cache import enable_compile_cache

    # persistent compile cache (repo .jax_cache / LOCO_COMPILE_CACHE): reruns
    # of the same experiment geometry skip the minutes-long TPU cold compile
    enable_compile_cache()

    args = parse_args(argv)
    if args.verify_load:
        from loco_edit_tpu.cli.verify_load import verify_checkpoint

        return verify_checkpoint(args)
    args = preset(args)

    if args.trace_dir:
        # capture a device trace of the WHOLE run (view in xprof/TensorBoard
        # or parse the perfetto JSON directly — BENCH.md profiling ledger)
        import contextlib

        from loco_edit_tpu.utils.logger import tpu_trace

        with contextlib.ExitStack() as stack:
            stack.enter_context(tpu_trace(args.trace_dir))
            args.trace_dir = ""
            return main_dispatch(args)
    return main_dispatch(args)


def main_dispatch(args):
    if args.is_stable_diffusion or args.is_DeepFloyd_IF_diffusion or args.is_LCM:
        return _main_t2i(args)

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
        x0, _, _ = get_sample_and_mask(args, pipe, denoiser, rng)
        if x0 is None:
            raise SystemExit("--run_ddim_inversion needs a real image; "
                             "--dataset_name Random has none")
        xT = pipe.invert(x0)
        from loco_edit_tpu.utils.io import save_image_grid

        save_image_grid(np.asarray(xT),
                        os.path.join(args.result_folder, "DDIMinversion.png"))

    if args.run_edit_null_space_projection:
        x0, xT, mask = get_sample_and_mask(args, pipe, denoiser, rng)
        pipe.run_edit_null_space_projection(
            x0=x0, xT=xT, mask=mask,
            sample_name=f"sample_idx{args.sample_idx}",
            vT_path=args.vT_path or None, random_edit=args.random_edit)

    if args.group_edit_null_space_projection:
        x0, xT, mask = get_sample_and_mask(args, pipe, denoiser, rng)
        if xT is None:
            xT = np.asarray(pipe.invert(x0))
        pipe.group_edit(xT, [args.vT_path, args.vT1_path],
                        sample_name=f"sample_idx{args.sample_idx}")


def _t2i_mask(args, pipe_make_image):
    """Two-phase SAM mask protocol for T2I engines (generate once + cache
    masks; later runs pick --mask_index), mirroring edit.py:941-956."""
    mask_path = os.path.join(args.result_folder, "mask", "mask.npz")
    if os.path.exists(mask_path):
        with np.load(mask_path) as z:
            masks = z["masks"]
        return masks[args.mask_index][None].astype(bool)
    if not args.use_mask:
        return None
    from loco_edit_tpu.masks.sam import extract_and_cache_masks

    x0 = pipe_make_image()
    extract_and_cache_masks(args, x0, mask_path)
    if args.sampling_mode:
        print("sampling_mode: masks extracted; rerun with --mask_index")
        sys.exit(0)
    with np.load(mask_path) as z:
        return z["masks"][args.mask_index][None].astype(bool)


def build_lcm_pipeline(args):
    from loco_edit_tpu.core.rng import seed_everything
    from loco_edit_tpu.models.t2i_registry import load_sd_bundle
    from loco_edit_tpu.pipelines.lcm import LCMEditConfig, LCMEditPipeline

    rng = seed_everything(args.seed)
    b = load_sd_bundle(args, lcm=True)
    cfg = LCMEditConfig(
        num_inference_steps=args.num_inference_steps,
        edit_t_idx=args.edit_t_idx, guidance_scale=args.guidance_scale,
        x_space_guidance_scale=args.x_space_guidance_scale,
        x_space_guidance_num_step=args.x_space_guidance_num_step,
        vis_num=args.vis_num, pca_rank=args.pca_rank,
        pca_rank_null=args.pca_rank_null,
        null_space_projection=args.null_space_projection,
        non_semantic=args.non_semantic, use_sega=args.use_sega,
        memory_bound=args.memory_bound,
        probe_chunk=args.probe_chunk or None,
        compute_dtype=args.dtype,
        mesh_probe=args.mesh_probe, mesh_data=args.mesh_data,
        pixel_output=args.pixel_output,
        result_folder=args.result_folder)
    pipe = LCMEditPipeline(b["unet_apply"], b["decode"],
                           b["prompt_encoder"], cfg, rng,
                           latent_shape=b["latent_shape"])
    return pipe, b, rng


def build_sd_pipeline(args):
    from loco_edit_tpu.core.rng import seed_everything
    from loco_edit_tpu.models.t2i_registry import load_sd_bundle
    from loco_edit_tpu.pipelines.sd import SDEditConfig, SDEditPipeline

    rng = seed_everything(args.seed)
    b = load_sd_bundle(args)
    cfg = SDEditConfig(
        for_steps=args.for_steps, inv_steps=args.inv_steps,
        inv_refine_steps=args.inv_refine_steps,
        edit_t=args.edit_t, guidance_scale=args.guidance_scale,
        guidance_scale_edit=args.guidance_scale_edit,
        x_space_guidance_scale=args.x_space_guidance_scale,
        x_space_guidance_edit_step=args.x_space_guidance_edit_step,
        x_space_guidance_num_step=args.x_space_guidance_num_step,
        vis_num=args.vis_num, vis_num_pc=args.pca_rank,
        pca_rank=args.pca_rank, pca_rank_null=args.pca_rank_null,
        null_space_projection=args.null_space_projection,
        use_sega=args.use_sega,
        tilda_v_score_type=args.tilda_v_score_type
        or "null+(for-null)+(edit-null)",
        memory_bound=args.memory_bound,
        probe_chunk=args.probe_chunk or None,
        compute_dtype=args.dtype,
        mesh_probe=args.mesh_probe, mesh_data=args.mesh_data,
        pixel_output=args.pixel_output,
        result_folder=args.result_folder)
    pipe = SDEditPipeline(b["unet_apply"], b["decode"], b["encode"],
                          b["prompt_encoder"], cfg, rng,
                          latent_shape=b["latent_shape"])
    return pipe, b, rng


def build_if_pipeline(args):
    from loco_edit_tpu.core.rng import seed_everything
    from loco_edit_tpu.models.t2i_registry import load_if_bundle
    from loco_edit_tpu.pipelines.deepfloyd import IFEditConfig, IFEditPipeline

    rng = seed_everything(args.seed)
    b = load_if_bundle(args)
    cfg = IFEditConfig(
        for_steps=args.for_steps, edit_t=args.edit_t,
        guidance_scale=args.guidance_scale,
        guidance_scale_edit=args.guidance_scale_edit,
        x_space_guidance_scale=args.x_space_guidance_scale,
        x_space_guidance_edit_step=args.x_space_guidance_edit_step,
        x_space_guidance_num_step=args.x_space_guidance_num_step,
        vis_num=args.vis_num, pca_rank=args.pca_rank,
        pca_rank_null=args.pca_rank_null,
        null_space_projection=args.null_space_projection,
        tilda_v_score_type=args.tilda_v_score_type or "(for-edit)-direct",
        jacobian=args.jacobian, probe_chunk=args.probe_chunk or None,
        memory_bound=args.memory_bound,
        mesh_probe=args.mesh_probe, mesh_data=args.mesh_data,
        pixel_output=args.pixel_output,
        result_folder=args.result_folder)
    pipe = IFEditPipeline(b["unet_apply"], b["prompt_encoder"], cfg, rng,
                          sample_shape=b["sample_shape"],
                          superres=b.get("superres"))
    return pipe, b, rng


def _main_t2i(args):
    import jax

    if args.is_LCM:
        pipe, b, rng = build_lcm_pipeline(args)
        if args.run_ddim_forward:
            # reference run_LCMforward (edit.py:102-145): sample a batch for a
            # model-load sanity check
            zT = np.asarray(jax.random.normal(
                rng.fork("fwd").key, (5,) + b["latent_shape"]))
            img = pipe.decode_to_image(
                pipe.forward_steps(zT, args.for_prompt)[1])
            from loco_edit_tpu.utils.io import save_image_grid

            save_image_grid(img, os.path.join(args.result_folder,
                                              "LCMforward.png"))
        if args.run_edit_null_space_projection_zt:
            mask = None
            if args.use_mask:
                mask = _t2i_mask(args, lambda: pipe.decode_to_image(
                    pipe.forward_steps(
                        np.asarray(jax.random.normal(
                            rng.fork("zT").key, (1,) + b["latent_shape"])),
                        args.for_prompt)[1]))
            pipe.run_edit_null_space_projection_zt(
                args.for_prompt, args.edit_prompt, mask=mask,
                vT_path=args.vT_path or None)
        return

    if args.is_stable_diffusion:
        pipe, b, rng = build_sd_pipeline(args)
        if args.run_ddim_forward:
            # reference EditStableDiffusion.run_DDIMforward (edit.py:556-566)
            zT = np.asarray(jax.random.normal(
                rng.fork("fwd").key, (5,) + b["latent_shape"]))
            img = pipe.decode_to_image(pipe.generate(
                zT, pipe.prompt_set(args.for_prompt, args.edit_prompt),
                "null+(for-null)"))
            from loco_edit_tpu.utils.io import save_image_grid

            save_image_grid(img, os.path.join(args.result_folder,
                                              "DDIMforward.png"))
        semantic = args.run_edit_null_space_projection_zt_semantic
        if args.run_edit_null_space_projection_zt or semantic:
            mask = None
            if args.use_mask:
                mask = _t2i_mask(args, lambda: pipe.decode_to_image(
                    pipe.generate(np.asarray(jax.random.normal(
                        rng.fork("zT").key, (1,) + b["latent_shape"])),
                        pipe.prompt_set(args.for_prompt, args.edit_prompt),
                        "null+(for-null)")))
            pipe.run_edit_null_space_projection_zt(
                args.for_prompt, args.edit_prompt, mask=mask,
                semantic=semantic, vT_path=args.vT_path or None)
        return

    # DeepFloyd-IF
    pipe, b, rng = build_if_pipeline(args)
    if args.run_ddim_forward:
        # reference EditDeepFloydIF DDPMforwardsteps debug sample (edit.py:1409)
        xT = np.asarray(jax.random.normal(
            rng.fork("fwd").key, (5,) + b["sample_shape"]))
        img = np.asarray(pipe.forward_steps(
            xT, pipe.prompt_set(args.for_prompt, args.edit_prompt),
            "null+(for-null)"))
        from loco_edit_tpu.utils.io import save_image_grid

        save_image_grid(img, os.path.join(args.result_folder, "IFforward.png"))
    semantic = args.run_edit_null_space_projection_xt_semantic
    if args.run_edit_null_space_projection_xt or semantic:
        mask = None
        if args.use_mask:
            if args.mask_type == "diffedit":
                prompts = pipe.prompt_set(args.for_prompt, args.edit_prompt)
                x0 = pipe.forward_steps(
                    np.asarray(jax.random.normal(
                        rng.fork("xT").key, (1,) + b["sample_shape"])),
                    prompts, "null+(for-null)")
                mask = np.repeat(pipe.diffedit_mask(np.asarray(x0), prompts),
                                 3, axis=-1)
            else:
                mask = _t2i_mask(args, lambda: np.asarray(pipe.forward_steps(
                    np.asarray(jax.random.normal(
                        rng.fork("xT").key, (1,) + b["sample_shape"])),
                    pipe.prompt_set(args.for_prompt, args.edit_prompt),
                    "null+(for-null)")))
        ablation = (args.ablation_method
                    if args.ablation_method in ("diffedit", "sega") else None)
        pipe.run_edit_null_space_projection_xt(
            args.for_prompt, args.edit_prompt, mask=mask,
            semantic=semantic or args.run_edit_null_space_projection_xt_semantic,
            ablation=ablation, vT_path=args.vT_path or None)
    return


if __name__ == "__main__":
    main()
