"""Typed configuration layer.

The reference scatters configuration over argparse flags, module-level constant
blocks, and OmegaConf YAML (see reference `inference.py:83-126`,
`config/wan2.1/wan_civitai.yaml`). Here everything is a frozen dataclass so a
config can be hashed into a jit static argument and validated once.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class WanDiTConfig:
    """Wan 3D diffusion-transformer geometry.

    Mirrors the checkpoint config of Wan2.1 DiTs (reference
    `wan_transformer3d.py:578-604`; real shapes come from the checkpoint's
    config.json via ``dict_mapping {in_dim: in_channels, dim: hidden_size}``).
    """

    model_type: str = "t2v"
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 2048
    ffn_dim: int = 8192
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 16
    num_layers: int = 32
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    rope_max_pos: int = 1024
    rope_theta: float = 10000.0
    # Pad the token stream to a multiple of this right after patch embed
    # (with in-kernel key masking). 128 = the flash kernel's lane tile:
    # q/k/v are then BORN at kernel-aligned length instead of being
    # pad-copied per attention (3x ~290 MB transient at 14B geometry).
    token_pad_multiple: int = 1
    # Compute each block's FFN in this many sequential token chunks: the
    # [L, ffn_dim] intermediate (783 MB bf16 at the 14B 29.6k-token
    # geometry) shrinks to 1/N per chunk at no MFU cost (the per-chunk
    # matmul M-dim stays in the thousands). Identical math — chunking a
    # matmul over rows is exact. >1 is what lets the fused 14B trajectory
    # fit beside 13.83 GiB of resident fp8 weights on a 16 GB chip.
    ffn_chunks: int = 1
    # RoPE rotation arithmetic dtype. "float32" (default) matches the
    # reference's fp32 complex rope exactly; "bfloat16" computes the
    # rotation in bf16 (the angle TABLES are still float64-derived) —
    # eliminates 2x ~580 MB fp32 HLO temps per attention at the 14B
    # 29.6k-token geometry.
    rope_dtype: str = "float32"
    # Tag self-/cross-attention outputs with jax.ad_checkpoint
    # checkpoint_name so a 'save_names:attn_out,xattn_out' remat policy can
    # save them. OFF by default: the name primitives change every traced
    # graph (invalidating compiled-executable caches) and are only needed
    # when that policy is requested.
    remat_tag_names: bool = False
    # Residual-stream storage dtype. "float32" (default) carries the stream
    # in fp32 between blocks (extra precision vs the reference, whose
    # autocast-bf16 blocks keep x in bf16); "bfloat16" halves stream-sized
    # HBM temporaries — needed to fit the 14B forward at the 29.6k-token
    # CoF geometry beside fp8 weights on a 16 GB chip. Norms/softmax/AdaLN
    # still compute in fp32 either way.
    stream_dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        assert self.dim % self.num_heads == 0
        return self.dim // self.num_heads

    def replace(self, **kw) -> "WanDiTConfig":
        return dataclasses.replace(self, **kw)


# Published Wan checkpoint geometries (shapes from the public checkpoints'
# config.json files; reference loads them via from_pretrained dict_mapping).
WAN21_T2V_1_3B = WanDiTConfig(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30)
WAN21_T2V_14B = WanDiTConfig(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40)
WAN21_I2V_14B = WanDiTConfig(model_type="i2v", in_dim=36, dim=5120,
                             ffn_dim=13824, num_heads=40, num_layers=40)
# Wan2.2 transformers are architecturally the t2v DiT with plain cross-attn
# (reference `wan_transformer3d.py:1302-1399`); the A14B MoE uses two of them.
WAN22_T2V_A14B = WanDiTConfig(dim=5120, ffn_dim=13824, num_heads=40,
                              num_layers=40)
WAN22_TI2V_5B = WanDiTConfig(dim=3072, ffn_dim=14336, num_heads=24,
                             num_layers=30, in_dim=48, out_dim=48)
# Tiny config for tests.
WAN_TINY = WanDiTConfig(dim=96, ffn_dim=256, num_heads=4, num_layers=2,
                        text_dim=64, text_len=16, freq_dim=32)


@dataclass(frozen=True)
class WanVAEConfig:
    """Causal 3D VAE (reference `wan_vae.py:599-645`): 8x8 spatial / 4x
    temporal compression, 16 latent channels, dim 96 backbone."""

    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    temporal_compression_ratio: int = 4
    spatial_compression_ratio: int = 8
    # Per-channel latent normalization baked into encode/decode
    # (reference `wan_vae.py:630-640`).
    latent_mean: Tuple[float, ...] = (
        -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
        0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
    )
    latent_std: Tuple[float, ...] = (
        2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
        3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
    )

    def replace(self, **kw) -> "WanVAEConfig":
        return dataclasses.replace(self, **kw)


VAE_TINY = WanVAEConfig(dim=8, z_dim=4, dim_mult=(1, 2, 2, 2), num_res_blocks=1,
                        latent_mean=(0.0,) * 4, latent_std=(1.0,) * 4)


@dataclass(frozen=True)
class T5Config:
    """umT5-xxl encoder (reference `wan_text_encoder.py`,
    `config/wan2.1/wan_civitai.yaml:16-26`)."""

    vocab: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    shared_pos: bool = False
    rel_max_dist: int = 128

    @property
    def head_dim(self) -> int:
        return self.dim_attn // self.num_heads

    def replace(self, **kw) -> "T5Config":
        return dataclasses.replace(self, **kw)


T5_TINY = T5Config(vocab=128, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                   num_layers=2, num_buckets=8)


@dataclass(frozen=True)
class ParallelConfig:
    """Mesh layout. data axis = per-item data parallelism (DCN-friendly),
    seq axis = Ulysses/ring sequence parallelism (ICI)."""

    data: int = 1
    seq: int = 1
    # "ulysses" (head all-to-all) or "ring" (KV rotation)
    seq_mode: str = "ulysses"

    @property
    def world(self) -> int:
        return self.data * self.seq


@dataclass(frozen=True)
class GenerationConfig:
    """Knobs of the reference entry points (`fast_infer.py:152-167`,
    `inference.py:99-126`)."""

    height: int = 480
    width: int = 832
    source_frames: int = 33
    reasoning_frames: int = 4
    num_inference_steps: int = 4
    guidance_scale: float = 1.0
    shift: float = 3.0
    sampler: str = "unipc"  # unipc | euler | dpm++
    repeat_rope: bool = True
    cot: bool = True
    seed: int = 0
    negative_prompt: str = (
        "Bright tones, overexposed, static, blurred details, subtitles, style,"
        " works, paintings, images, static, overall gray, worst quality, low"
        " quality, JPEG compression residue, ugly, incomplete, extra fingers,"
        " poorly drawn hands, poorly drawn faces, deformed, disfigured,"
        " misshapen limbs, fused fingers, still picture, messy background,"
        " three legs, many people in the background, walking backwards"
    )
    # TeaCache (reference `inference.py:106-109`)
    enable_teacache: bool = False
    teacache_threshold: float = 0.10
    teacache_skip_start_steps: int = 5
    cfg_skip_ratio: float = 0.0
