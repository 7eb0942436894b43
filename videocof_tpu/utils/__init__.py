from .video_io import (color_transfer, load_video_frames, merge_video_audio,
                       save_results, save_side_by_side, save_video,
                       save_videos_grid)
from . import checkpoint, fp8, layouts, profiling

__all__ = ["load_video_frames", "save_video", "save_side_by_side",
           "save_results", "save_videos_grid", "color_transfer",
           "merge_video_audio", "checkpoint", "fp8", "layouts", "profiling"]
