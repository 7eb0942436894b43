from .wan_pipeline import WanPipeline, WanPipelineOutput

__all__ = ["WanPipeline", "WanPipelineOutput"]
