from .video_io import (load_video_frames, save_video, save_side_by_side,
                       save_results)
from . import checkpoint, fp8, layouts, profiling

__all__ = ["load_video_frames", "save_video", "save_side_by_side",
           "save_results", "checkpoint", "fp8", "layouts", "profiling"]
