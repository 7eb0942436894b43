from .wan_pipeline import WanPipeline, WanPipelineOutput
from .wan22_pipeline import Wan22Pipeline
from .image_pipelines import (CogVideoXPipeline, FluxPipeline,
                              QwenImagePipeline, calculate_mu_shift)

__all__ = ["WanPipeline", "WanPipelineOutput", "Wan22Pipeline",
           "CogVideoXPipeline", "FluxPipeline", "QwenImagePipeline",
           "calculate_mu_shift"]
