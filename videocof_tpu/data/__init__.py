from .instructions import derive_ground_object_from_instruction, build_cot_prompt
from .tokenizer import WanTokenizer

__all__ = ["derive_ground_object_from_instruction", "build_cot_prompt",
           "WanTokenizer"]
