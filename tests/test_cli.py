"""CLI surface tests: flag parity, preset derivation, and the full TinyTest
end-to-end run (the smoke_tinytest.sh path)."""

import os

import numpy as np
import pytest

from loco_edit_tpu.cli.args import parse_args, preset


def test_flag_surface_parity():
    """Every live reference flag must parse (spot-check the flagship script's
    flag set, src/scripts/main_celeba_hf_null_space_projection.sh)."""
    args = parse_args([
        "--sample_idx", "4729", "--dtype", "fp32", "--seed", "1",
        "--model_name", "CelebA_HQ_HF", "--dataset_name", "CelebA_HQ_mask",
        "--for_steps", "100", "--inv_steps", "100",
        "--use_yh_custom_scheduler", "True",
        "--x_space_guidance_edit_step", "1",
        "--x_space_guidance_scale", "0.5",
        "--x_space_guidance_num_step", "16",
        "--edit_t", "0.6", "--performance_boosting_t", "0.2",
        "--run_edit_null_space_projection", "True",
        "--dataset_root", "/data", "--choose_sem", "l_eye",
        "--null_space_projection", "True", "--use_mask", "True",
        "--pca_rank_null", "5", "--pca_rank", "1", "--vis_num", "2",
    ])
    assert args.edit_t == 0.6 and args.pca_rank == 1


def test_preset_derivations(tmp_path):
    args = parse_args(["--model_name", "FFHQ_P2", "--dataset_name", "FFHQ",
                       "--for_steps", "100", "--performance_boosting_t", "0.2",
                       "--result_folder", str(tmp_path)])
    args = preset(args)
    assert args.image_size == 256 and args.c_in == 3
    assert not args.is_stable_diffusion
    assert os.path.isdir(args.result_folder)


def test_preset_scale_lookup(tmp_path):
    args = parse_args(["--model_name", "FFHQ_P2", "--dataset_name", "FFHQ",
                       "--for_steps", "100", "--performance_boosting_t", "0.2",
                       "--use_x_space_guidance", "true", "--h_t", "0.6",
                       "--result_folder", str(tmp_path)])
    args = preset(args)
    assert args.x_space_guidance_scale == 4  # params.py uncond dict @0.6


def test_preset_invariants_enforced(tmp_path):
    args = parse_args(["--model_name", "FFHQ_P2", "--dataset_name", "FFHQ",
                       "--for_steps", "50", "--performance_boosting_t", "0.2",
                       "--result_folder", str(tmp_path)])
    with pytest.raises(AssertionError):
        preset(args)


def test_cli_end_to_end_tinytest(tmp_path):
    from loco_edit_tpu.cli.main import main

    main(["--model_name", "TinyTest", "--dataset_name", "Random",
          "--for_steps", "10", "--inv_steps", "10", "--edit_t", "0.6",
          "--performance_boosting_t", "0.2",
          "--x_space_guidance_scale", "0.5", "--x_space_guidance_num_step", "4",
          "--pca_rank", "2", "--pca_rank_null", "2", "--vis_num", "2",
          "--null_space_projection", "false", "--use_mask", "false",
          "--run_edit_null_space_projection", "true", "--seed", "7",
          "--result_folder", str(tmp_path)])
    pngs = []
    for root, _, files in os.walk(tmp_path):
        pngs += [f for f in files if f.endswith(".png")]
    assert any(f.startswith("edit-") for f in pngs)


def test_parity_eval_dry_run(tmp_path):
    """BASELINE protocol-3 harness (scripts/parity_eval.sh) on the tiny model:
    one command produces locality metrics end-to-end."""
    from loco_edit_tpu.cli.parity_eval import main

    recs = main([
        "--model_name", "TinyTest", "--dataset_name", "Random",
        "--sample_specs", "0:hair", "--for_steps", "8",
        "--pca_rank", "1", "--pca_rank_null", "1",
        "--x_space_guidance_num_step", "4",
        "--result_folder", str(tmp_path), "--seed", "3",
    ])
    assert len(recs) == 1
    r = recs[0]
    assert 0.0 <= r["ssim"] <= 1.0
    assert r["offmask_mse"] >= 0.0 and r["inmask_mse"] >= 0.0
    assert (tmp_path / "parity_metrics.jsonl").exists()


def test_cli_mesh_sp_smoke(tmp_path):
    """--mesh_sp shards the image height over the virtual mesh through the
    full CLI edit path."""
    from loco_edit_tpu.cli.main import main

    main(["--model_name", "TinyTest", "--dataset_name", "Random",
          "--for_steps", "8", "--inv_steps", "8", "--edit_t", "0.6",
          "--performance_boosting_t", "0.2", "--x_space_guidance_scale", "0.5",
          "--x_space_guidance_num_step", "2", "--pca_rank", "1",
          "--pca_rank_null", "1", "--vis_num", "1", "--mesh_sp", "8",
          "--null_space_projection", "false", "--use_mask", "false",
          "--run_edit_null_space_projection", "true",
          "--result_folder", str(tmp_path), "--seed", "3"])
    import os

    pngs = [f for _, _, fs in os.walk(tmp_path) for f in fs if f.endswith(".png")]
    assert any(f.startswith("edit-") for f in pngs)


def test_two_phase_sam_protocol_through_cli(tmp_path):
    """The reference's SAM two-phase protocol end-to-end through the CLI
    with the flax backend: phase 1 (--sampling_mode) extracts + caches masks
    from the generated sample and EXITS; phase 2 (--mask_index) consumes the
    cache and runs the flagship edit with that mask."""
    import numpy as np
    import pytest

    pytest.importorskip("torch")
    from tests.test_sam_decoder_flax import _tiny_torch_sam

    from loco_edit_tpu.cli.main import main as cli_main

    _, _, sam_model = _tiny_torch_sam()
    mdir = tmp_path / "tiny-sam"
    sam_model.save_pretrained(mdir)

    root = str(tmp_path / "runs")
    common = [
        "--model_name", "TinyTest", "--dataset_name", "Random",
        "--for_steps", "6", "--inv_steps", "6", "--edit_t", "0.6",
        "--x_space_guidance_scale", "0.5", "--x_space_guidance_num_step", "2",
        "--pca_rank", "1", "--pca_rank_null", "1", "--vis_num", "1",
        "--run_edit_null_space_projection", "true", "--seed", "3",
        "--use_mask", "true", "--mask_backend", "flax",
        "--mask_model_name", str(mdir), "--filter_mask", "0",
        "--result_folder", root,
    ]
    # phase 1: extract masks, then exit(0)
    with pytest.raises(SystemExit) as e:
        cli_main(common + ["--sampling_mode", "true"])
    assert e.value.code == 0
    import glob
    import os

    cache = glob.glob(os.path.join(root, "**", "mask", "mask.npz"),
                      recursive=True)
    assert len(cache) == 1
    with np.load(cache[0]) as z:
        masks = z["masks"]
    assert masks.ndim == 4 and masks.dtype == bool  # (N, H, W, 3)

    # phase 2: consume the cached mask and run the edit
    cli_main(common + ["--mask_index", "0", "--null_space_projection", "true"])
    strips = glob.glob(os.path.join(root, "**", "*.png"), recursive=True)
    assert strips, "edit produced no output strips"


def test_trace_dir_captures_device_trace(tmp_path):
    """--trace_dir wraps the whole run in a jax.profiler trace; the perfetto
    trace file appears under the dir (the BENCH.md ledger workflow)."""
    import glob

    from loco_edit_tpu.cli.main import main as cli_main

    td = str(tmp_path / "trace")
    cli_main([
        "--model_name", "TinyTest", "--dataset_name", "Random",
        "--for_steps", "4", "--inv_steps", "4", "--edit_t", "0.6",
        "--x_space_guidance_scale", "0.5", "--x_space_guidance_num_step", "2",
        "--pca_rank", "1", "--pca_rank_null", "1", "--vis_num", "1",
        "--use_mask", "false", "--null_space_projection", "false",
        "--run_edit_null_space_projection", "true", "--seed", "5",
        "--result_folder", str(tmp_path / "runs"), "--trace_dir", td])
    traces = glob.glob(td + "/**/*.trace.json.gz", recursive=True)
    assert traces, "no perfetto trace captured"
