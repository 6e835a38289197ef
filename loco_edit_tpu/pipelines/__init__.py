from loco_edit_tpu.pipelines.uncond import UncondEditConfig, UncondEditPipeline

__all__ = ["UncondEditConfig", "UncondEditPipeline"]
