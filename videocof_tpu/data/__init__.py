from .instructions import derive_ground_object_from_instruction, build_cot_prompt
from .tokenizer import WanTokenizer
from .dataset import (CoTTripletDataset, apply_gray_overlay,
                      apply_gray_region_effect, build_gray_mask,
                      interpolate_ground_frames)

__all__ = ["derive_ground_object_from_instruction", "build_cot_prompt",
           "WanTokenizer", "CoTTripletDataset", "interpolate_ground_frames",
           "build_gray_mask", "apply_gray_region_effect",
           "apply_gray_overlay"]
