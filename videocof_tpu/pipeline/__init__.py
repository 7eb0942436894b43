from .wan_pipeline import WanPipeline, WanPipelineOutput
from .wan22_pipeline import Wan22Pipeline
from .vace_pipeline import VacePipeline
from .s2v_pipeline import S2VPipeline
from .camera_pipeline import CameraPipeline
from .image_pipelines import (CogVideoXPipeline, FluxPipeline,
                              QwenImagePipeline, calculate_mu_shift)
from .varlen import batch_edit

__all__ = ["WanPipeline", "WanPipelineOutput", "Wan22Pipeline",
           "VacePipeline", "S2VPipeline", "CameraPipeline",
           "CogVideoXPipeline", "FluxPipeline", "QwenImagePipeline",
           "calculate_mu_shift", "batch_edit"]
