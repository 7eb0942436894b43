from .wan_pipeline import WanPipeline, WanPipelineOutput
from .wan22_pipeline import Wan22Pipeline

__all__ = ["WanPipeline", "WanPipelineOutput", "Wan22Pipeline"]
