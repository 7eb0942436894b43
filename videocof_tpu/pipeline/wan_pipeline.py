"""Chain-of-frames editing pipeline (the heart of VideoCoF), TPU-native.

Behavioural parity target: reference `videox_fun/pipeline/pipeline_wan.py`
(`WanPipeline.__call__:516-799`) — T5 prompt encoding with zero-padded
embeddings and no cross-attn mask, CoT latent layout [src | noise(ground) |
noise(tgt)] (`prepare_cot_video_latents:381-419`), per-step source freezing
(`noise_pred[:, :, :condition_count] = 0` at `:735-737`), CFG by batch
doubling, segment-wise VAE decode (`:757-786`).

TPU-first structure: on the default path the WHOLE denoise trajectory runs as
one compiled scan (`fused_sampler.py`); otherwise each step is one jitted
function (CFG doubling, DiT forward, guidance combine, source freeze) plus a
jitted sampler update from host-precomputed scalar coefficients. RoPE segment
geometry enters as cos/sin data cached per call geometry. Compiled
executables are cached per (geometry, steps, cfg-flag) signature, so batch
editing at a fixed bucket recompiles nothing after the first video.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import GenerationConfig, T5Config, WanDiTConfig, WanVAEConfig
from ..models import t5_encoder, wan_dit, wan_vae
from ..models import wan_vae_streaming
from ..schedulers import get_scheduler
from ..data.tokenizer import WanTokenizer
from ..utils import colorspace


@dataclasses.dataclass
class WanPipelineOutput:
    """Decoded videos as float numpy arrays in [0, 1], layout [B, C, T, H, W]
    (reference `WanPipelineOutput` — `pipeline_wan.py:92-106`)."""
    videos: np.ndarray
    ground_videos: Optional[np.ndarray] = None
    edit_videos: Optional[np.ndarray] = None
    # final denoised latents, attached when __call__(output_latents=True)
    latents: Optional[np.ndarray] = None


def latent_frame_count(pixel_frames: int, ratio: int = 4) -> int:
    """(F - 1) // ratio + 1, F==1 -> 1 (reference `pipeline_wan.py:630-637`)."""
    if pixel_frames <= 1:
        return 1
    return (pixel_frames - 1) // ratio + 1


class WanPipeline:
    def __init__(
        self,
        dit_params, dit_cfg: WanDiTConfig,
        vae_params, vae_cfg: WanVAEConfig,
        t5_params, t5_cfg: T5Config,
        tokenizer: Optional[WanTokenizer] = None,
        dtype=jnp.bfloat16,
        attn_backend: Optional[str] = None,
    ):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.t5_params = t5_params
        self.t5_cfg = t5_cfg
        self.tokenizer = tokenizer or WanTokenizer(vocab_size=t5_cfg.vocab)
        self.dtype = dtype
        self.attn_backend = attn_backend
        self._jit_cache: Dict[Any, Any] = {}
        self._vae_jit: Dict[Any, Any] = {}
        # streaming VAE: bounded memory per step (two compiled graphs per
        # geometry); the whole-sequence path is used for short clips
        self.vae_streaming_threshold_frames = 2
        # 3 latent frames per streaming decode step: one fewer ~0.5 s tunnel
        # dispatch than 2 for the 9-frame edit segment (r5 sweep,
        # scripts/probe_decode_chunk.py); chunk 4 ResourceExhausts beside
        # resident 1.3B weights on a 16 GB chip (measured, r5)
        self.vae_decode_chunk = 3
        self.vae_encode_chunk = 4
        self._rope_cache: Dict[Any, Any] = {}
        # Sequential CFG: run cond/uncond as TWO batch-1 dispatches of the
        # same executable instead of the reference's batch-cat x2
        # (`pipeline_wan.py:700`). At 14B-scale token counts the step is
        # compute-bound, so this costs ~nothing — and it HALVES the step's
        # activation footprint, which is what lets the reference's standard
        # 50-step CFG path run beside fp8-resident 14B weights on a 16 GB
        # chip (batch-2 OOMs by 1.4 GiB: the [2, 29.7k, 13824] FFN temp).
        # Forces the stepwise trajectory (fused/segmented scans stay
        # batched).
        self.cfg_sequential = False
        # dispatches that hit a precompile_fused AOT runner (shipped-weights
        # path); VIDEOCOF_TIMING labels those dispatches — a zero here after
        # precompile+call means the fused key stopped mirroring (see
        # fused_sampler.fused_cache_key)
        self.aot_runner_hits = 0
        # VIDEOCOF_TIMING=1: per-stage wall times to stderr
        import os as _os
        self.verbose_timing = _os.environ.get("VIDEOCOF_TIMING") == "1"

    # --------------------------------------------------------- runtime LoRA
    def set_runtime_lora(self, runtime) -> None:
        """Attach/detach RUNTIME LoRA adapters (`lora.load_runtime_lora`):
        a ``"lora__"`` node rides the DiT param tree(s) and the forward
        fuses each block's delta inside the scanned body — the only LoRA
        path compatible with fp8-resident weights (merging into fp8 would
        re-materialize bf16; `merge_lora` refuses). ``runtime=None``
        detaches. Changing the attachment changes the param-tree structure,
        so compiled executables (incl. AOT precompiled runners) retrace on
        the next call — expected, one-time."""
        import jax as _jax
        import jax.numpy as _jnp
        for attr in ("dit_params", "dit_params_2"):
            tree = getattr(self, attr, None)
            if tree is None:
                continue
            if runtime is None:
                tree.pop("lora__", None)
            else:
                tree["lora__"] = {
                    "blocks": _jax.tree.map(_jnp.asarray, runtime["blocks"]),
                    "scale": _jnp.float32(runtime.get("scale", 1.0)),
                }
        # executables trace against the old tree STRUCTURE; drop them so the
        # next call retraces rather than mixing cache keys across shapes
        self._jit_cache.clear()
        self._rope_cache.clear()

    # ----------------------------------------------------------- parallelism
    def enable_sequence_parallel(self, mesh=None, data: int = 1,
                                 seq: Optional[int] = None,
                                 mode: str = "ulysses",
                                 cfg_parallel: bool = False,
                                 model: int = 1) -> None:
        """Run the WHOLE DiT forward sequence-parallel over the mesh's
        ``seq`` axis: the residual stream (patch embed -> blocks -> head) is
        token-sharded and gathered at the head exit, mirroring the
        reference's `wan_transformer3d.py:949-953,1085-1086` — but
        CoF-compatible, since RoPE enters as per-token data sharded with the
        tokens. Non-dividing token counts are padded (with key masking)
        to a multiple of the seq axis.

        ``cfg_parallel=True`` (needs data >= 2): during CFG steps the
        cond/uncond doubled batch shards over the ``data`` axis so each
        device group runs one guidance branch — the reference's
        classifier_free_guidance_degree (`dist/fuser.py:35-49`).

        ``model > 1``: additionally tensor-parallel the DiT over the
        ``model`` mesh axis (Megatron column/row sharding of heads + FFN,
        `parallel/tp.py`) — the DiT params are re-placed with TP shardings
        and the attention runs heads-local inside one shard_map that also
        carries the Ulysses all-to-all when ``seq > 1``. A capability beyond
        the reference; pairs with fp8 for >16 GB models on small chips.
        """
        from ..parallel import (SPContext, make_mesh, make_ring_attention,
                                make_tp_attention, make_ulysses_attention,
                                tp_param_shardings, validate_tp)
        if mesh is None:
            import jax as _jax
            seq = seq or max(1, len(_jax.devices()) // (data * model))
            mesh = make_mesh(data=data, seq=seq, model=model)
        if cfg_parallel and mesh.shape["data"] < 2:
            raise ValueError("cfg_parallel needs a data axis of >= 2")
        tp = dict(mesh.shape).get("model", 1)
        self.attn_backend_cfgpar = None
        if tp > 1:
            validate_tp(self.dit_cfg, mesh)
            shardings = tp_param_shardings(mesh, self.dit_params)
            self.dit_params = jax.device_put(self.dit_params, shardings)
            p2 = getattr(self, "dit_params_2", None)
            if p2 is not None:
                self.dit_params_2 = jax.device_put(
                    p2, tp_param_shardings(mesh, p2))
            seq_ax = "seq" if mesh.shape["seq"] > 1 else None
            self.attn_backend = make_tp_attention(mesh, seq_axis=seq_ax)
            if cfg_parallel:
                self.attn_backend_cfgpar = make_tp_attention(
                    mesh, seq_axis=seq_ax, batch_axis="data")
        else:
            maker = {"ulysses": make_ulysses_attention,
                     "ring": make_ring_attention}[mode]
            self.attn_backend = maker(mesh)
            if cfg_parallel:
                # CFG steps shard the doubled batch over 'data'; the
                # attention shard_map must carry that axis in its specs or
                # GSPMD all-gathers the batch at EVERY block — each device
                # would compute both guidance branches for the dominant op
                self.attn_backend_cfgpar = maker(mesh, batch_axis="data")
        self.sp_mesh = mesh
        self.sp_ctx = SPContext(mesh)
        self.cfg_parallel = cfg_parallel
        self._jit_cache.clear()

    def disable_sequence_parallel(self) -> None:
        self.attn_backend = None
        self.attn_backend_cfgpar = None
        self.sp_mesh = None
        self.sp_ctx = None
        self.cfg_parallel = False
        self._jit_cache.clear()

    # ------------------------------------------------------------------ text
    def encode_prompt(self, prompts: Sequence[str], max_length: int = 512
                      ) -> jax.Array:
        """Prompts -> [B, text_len, text_dim] embeddings, zero-padded past
        each prompt's length (the reference truncates per sample then
        zero-pads; padded positions then flow through the text MLP unmasked —
        `pipeline_wan.py:140-182`, `wan_transformer3d.py:937-942`)."""
        ids, mask = self.tokenizer(list(prompts), max_length=max_length)
        if "t5" not in self._jit_cache:
            cfg = self.t5_cfg

            @jax.jit
            def enc(params, ids, mask):
                e = t5_encoder.t5_encode(params, cfg, ids, mask)
                return e * mask[..., None].astype(e.dtype)

            self._jit_cache["t5"] = enc
        return self._jit_cache["t5"](self.t5_params, jnp.asarray(ids),
                                     jnp.asarray(mask))

    # ---------------------------------------------------------------- latents
    def _prepare_video(self, video, prompts, convert: bool = True
                       ) -> jax.Array:
        """Shared input contract for every pipeline variant: accepts float
        video in [-1, 1], uint8 RGB in [0, 255] ([B, 3, T, H, W] — crosses
        the host->device link 4x cheaper than fp32 and is normalized on
        device), or uint8 I420 planes ([B, T, H*3//2, W] — codec-native
        4:2:0, HALF the u8 RGB bytes; the chroma upsample runs on device).
        Checks one prompt per batch item. ``convert=False`` leaves uint8
        as-is — the fused CoT latent prep converts INSIDE its one-program
        encode."""
        video = jnp.asarray(video)
        if video.dtype == jnp.uint8 and convert:
            if video.ndim == 4:  # I420 planes
                if "i420_in" not in self._jit_cache:
                    self._jit_cache["i420_in"] = jax.jit(
                        lambda x: colorspace.i420_to_rgbm11_jax(x)
                        .astype(self.dtype))
                video = self._jit_cache["i420_in"](video)
            else:
                if "u8_in" not in self._jit_cache:
                    self._jit_cache["u8_in"] = jax.jit(
                        lambda x: x.astype(self.dtype) * (2.0 / 255.0) - 1.0)
                video = self._jit_cache["u8_in"](video)
        if len(prompts) != video.shape[0]:
            raise ValueError(
                f"got {len(prompts)} prompts for batch of {video.shape[0]}")
        return video

    def _vae_mods(self):
        """(whole-sequence, streaming) VAE modules for this pipeline's VAE
        config: the Wan2.1 causal VAE by default, the Wan2.2 3.8 VAE
        (16x spatial, `AutoencoderKLWan3_8` — the TI2V-5B family's VAE,
        reference `config/wan2.2/wan_civitai_5b.yaml:11-12`) when
        ``vae_cfg`` is a `Wan22VAEConfig`."""
        from ..models.wan_vae22 import Wan22VAEConfig
        if isinstance(self.vae_cfg, Wan22VAEConfig):
            from ..models import wan_vae22, wan_vae22_streaming
            return wan_vae22, wan_vae22_streaming
        return wan_vae, wan_vae_streaming

    def _encode_fused_ok(self, n_px_frames: int) -> bool:
        """Fused one-program encode only below the frame bound AND when the
        pipeline allows it: the inline chunk loop's XLA schedule needs
        41.6 GiB at 133+4 frames (compile-time OOM on 16 GB, r5), and even
        at 33+4 frames it ResourceExhausts beside DUAL-expert weight
        residency (Wan2.2 MoE sets ``encode_fused_enabled = False``) —
        those paths take the per-chunk dispatches instead."""
        import os as _os
        return (getattr(self, "encode_fused_enabled", True)
                and n_px_frames <= int(_os.environ.get(
                    "VIDEOCOF_ENCODE_FUSED_MAX_FRAMES", "57"))
                and _os.environ.get("VIDEOCOF_ENCODE_FUSED", "1") == "1")

    def vae_encode(self, video: jax.Array) -> jax.Array:
        whole, stream = self._vae_mods()
        if video.shape[2] > self.vae_streaming_threshold_frames:
            fused = getattr(stream, "encode_streaming_fused", None)
            if fused is not None and self._encode_fused_ok(video.shape[2]):
                # whole streaming encode as ONE program (same chunk-sized
                # live ranges, ~6-8x fewer tunnel dispatches); =0 reverts to
                # one dispatch per chunk
                mu, _ = fused(self.vae_params, self.vae_cfg,
                              video.astype(self.dtype),
                              jit_cache=self._vae_jit,
                              chunk_latent=self.vae_encode_chunk)
            else:
                mu, _ = stream.encode_streaming(
                    self.vae_params, self.vae_cfg, video.astype(self.dtype),
                    jit_cache=self._vae_jit,
                    chunk_latent=self.vae_encode_chunk)
        else:
            mu, _ = whole.encode(self.vae_params, self.vae_cfg,
                                 video.astype(self.dtype))
        return mu

    def vae_decode(self, z: jax.Array) -> jax.Array:
        whole, stream = self._vae_mods()
        if z.shape[2] > self.vae_streaming_threshold_frames:
            return stream.decode_streaming(
                self.vae_params, self.vae_cfg, z.astype(self.dtype),
                jit_cache=self._vae_jit,
                chunk_latent=self.vae_decode_chunk)
        return whole.decode(self.vae_params, self.vae_cfg,
                            z.astype(self.dtype))

    def _backend_for(self, do_cfg: bool):
        """The attention backend for a trajectory: the batch-axis-aware
        variant during CFG-parallel steps, the plain one otherwise."""
        if do_cfg and getattr(self, "cfg_parallel", False):
            alt = getattr(self, "attn_backend_cfgpar", None)
            if alt is not None:
                return alt
        return self.attn_backend

    def _sp_for(self, do_cfg: bool):
        """SPContext for a trajectory: the cfg-parallel variant when CFG is
        on and the pipeline was configured with cfg_parallel (cond/uncond
        rows sharded over the data axis)."""
        sp = getattr(self, "sp_ctx", None)
        if sp is not None and do_cfg and getattr(self, "cfg_parallel", False):
            sp = sp.with_cfg_parallel()
        return sp

    def _post_u8(self):
        if "post_u8" not in self._jit_cache:
            self._jit_cache["post_u8"] = jax.jit(lambda x: jnp.clip(
                jnp.round(x.astype(jnp.float32) * 127.5 + 127.5), 0, 255
            ).astype(jnp.uint8))
        return self._jit_cache["post_u8"]

    def decode_to_u8_device(self, z: jax.Array) -> jax.Array:
        """Decode to DEVICE-resident uint8 [0, 255] — no host fetch. The
        streaming path converts each chunk to uint8 on device and
        concatenates there, so multiple segments can share ONE host fetch
        (`_decode_outputs`): on transports with a per-transfer latency floor
        (the axon tunnel: ~0.5 s/fetch) every avoided fetch is wall-clock."""
        import os as _os
        if z.shape[2] > self.vae_streaming_threshold_frames:
            stream = self._vae_mods()[1]
            u8_stream = getattr(stream, "decode_streaming_u8", None)
            if u8_stream is not None and \
                    _os.environ.get("VIDEOCOF_DECODE_INPROGRAM", "1") == "1":
                # one dispatch per chunk, everything (scale/slice/decode/
                # clip/uint8) in-program — see wan_vae_streaming
                return u8_stream(self.vae_params, self.vae_cfg, z,
                                 jit_cache=self._vae_jit,
                                 chunk_latent=self.vae_decode_chunk,
                                 compute_dtype=self.dtype)
            post_u8 = self._post_u8()
            chunks = [post_u8(c) for c in
                      stream.decode_streaming_chunks(
                          self.vae_params, self.vae_cfg,
                          z.astype(self.dtype), jit_cache=self._vae_jit,
                          chunk_latent=self.vae_decode_chunk)]
            return (chunks[0] if len(chunks) == 1
                    else jnp.concatenate(chunks, axis=2))
        return self._post_u8()(self.vae_decode(z))

    def decode_to_numpy01(self, z: jax.Array) -> np.ndarray:
        """Decode + map [-1,1] -> [0,1]. The video crosses host<->device as
        uint8 (the tunnel/PCIe traffic is 4x smaller than fp32 and the final
        consumer is an 8-bit codec anyway); fp32 [0,1] is materialized on the
        HOST.

        ``VIDEOCOF_DECODE_OVERLAP=1``: on the streaming path, convert each
        decoded chunk to uint8 on device and start its host copy while the
        next chunk decodes. Wins on a local PCIe-attached chip; the DEFAULT
        is one whole-array fetch, because transports with per-transfer
        latency (the axon tunnel here: ~32 MB/s, ~0.5 s/fetch floor) lose
        more to N small round-trips than overlap recovers (A/B: 7.2 s ->
        9.1 s decode stage at 480p)."""
        post_u8 = self._post_u8()
        import os as _os
        chunk_gen = getattr(self._vae_mods()[1], "decode_streaming_chunks",
                            None)
        overlap = (_os.environ.get("VIDEOCOF_DECODE_OVERLAP") == "1"
                   and chunk_gen is not None)
        if overlap and z.shape[2] > self.vae_streaming_threshold_frames:
            u8_chunks = []
            for chunk in chunk_gen(
                    self.vae_params, self.vae_cfg, z.astype(self.dtype),
                    jit_cache=self._vae_jit,
                    chunk_latent=self.vae_decode_chunk):
                u8 = post_u8(chunk)
                try:
                    u8.copy_to_host_async()
                except Exception:
                    pass  # backend without async fetch: np.asarray blocks
                u8_chunks.append(u8)
            host = np.concatenate([np.asarray(c) for c in u8_chunks], axis=2)
        else:
            host = np.asarray(post_u8(self.vae_decode(z)))
        return host.astype(np.float32) / 255.0

    def prepare_cot_latents(self, video: jax.Array, ground_latent_count: int,
                            key: jax.Array,
                            noise: Optional[jax.Array] = None) -> jax.Array:
        """[src | noise(ground+tgt)] — `prepare_cot_video_latents:381-419`.
        Source latents use the distribution mode (mu). ``noise`` overrides
        the PRNG draw (deterministic cross-framework runs / oracle tests).

        Default path (`VIDEOCOF_ENCODE_FUSED=1`): the WHOLE prep — uint8
        normalize, streaming VAE encode (chunk loop traced inline), noise
        draw, concat — is ONE compiled program. On the remote transport
        that's 1 dispatch where the chunked path pays ~8-10 (50-100 ms
        each). `=0` reverts to the per-chunk dispatch path.

        Long inputs fall back to the chunked path automatically: the fused
        program traces the streaming chunk loop INLINE, and at the 4x
        extrapolation length (133+4 frames, ~34 chunks in one program) the
        XLA schedule needs 41.6 GiB — a compile-time OOM on a 16 GB chip
        (measured r5). ``VIDEOCOF_ENCODE_FUSED_MAX_FRAMES`` (default 57)
        bounds the fused path to geometries where it is known to fit."""
        import os as _os
        video = jnp.asarray(video)
        n_px_frames = (video.shape[1] if video.ndim == 4
                       else video.shape[2])
        if noise is None and self._encode_fused_ok(n_px_frames):
            ckey = ("cot_prep_fused", video.shape, str(video.dtype),
                    ground_latent_count, self.vae_encode_chunk)
            if ckey not in self._vae_jit:
                whole, stream = self._vae_mods()
                # pixel-frame count: axis 1 for 4D I420 planes, axis 2 for
                # 5D [B, C, T, H, W]
                n_frames = (video.shape[1] if video.ndim == 4
                            else video.shape[2])
                use_stream = n_frames > self.vae_streaming_threshold_frames
                cfg, dtype = self.vae_cfg, self.dtype
                chunk, g = self.vae_encode_chunk, ground_latent_count

                def prog(vp, vid, k):
                    if vid.dtype == jnp.uint8 and vid.ndim == 4:
                        v = colorspace.i420_to_rgbm11_jax(vid).astype(dtype)
                    elif vid.dtype == jnp.uint8:
                        v = vid.astype(dtype) * (2.0 / 255.0) - 1.0
                    else:
                        v = vid.astype(dtype)
                    if use_stream:
                        mu, _ = stream.encode_streaming(vp, cfg, v,
                                                        jit_cache=None,
                                                        chunk_latent=chunk)
                    else:
                        mu, _ = whole.encode(vp, cfg, v)
                    B, C, Tl, H, W = mu.shape
                    nz = jax.random.normal(k, (B, C, Tl + g, H, W),
                                           jnp.float32)
                    return jnp.concatenate([mu.astype(jnp.float32), nz],
                                           axis=2)

                self._vae_jit[ckey] = jax.jit(prog)
            return self._vae_jit[ckey](self.vae_params, video, key)
        if video.dtype == jnp.uint8:  # __call__ defers u8 normalize to here
            video = self._prepare_video(video, ["x"] * video.shape[0])
        mu = self.vae_encode(video)
        B, C, Tl, H, W = mu.shape
        if noise is None:
            noise = jax.random.normal(
                key, (B, C, Tl + ground_latent_count, H, W), jnp.float32)
        else:
            noise = jnp.asarray(noise, jnp.float32)
            assert noise.shape == (B, C, Tl + ground_latent_count, H, W), \
                (noise.shape, (B, C, Tl + ground_latent_count, H, W))
        return jnp.concatenate([mu.astype(jnp.float32), noise], axis=2)

    def prepare_paired_latents(self, video: jax.Array, key: jax.Array,
                               noise: Optional[jax.Array] = None
                               ) -> jax.Array:
        """[src | noise(tgt)] — `prepare_video_latents_new:343-378`."""
        mu = self.vae_encode(video)
        if noise is None:
            noise = jax.random.normal(key, mu.shape, jnp.float32)
        else:
            noise = jnp.asarray(noise, jnp.float32)
            assert noise.shape == mu.shape, (noise.shape, mu.shape)
        return jnp.concatenate([mu.astype(jnp.float32), noise], axis=2)

    # ------------------------------------------------------------------ i2v
    def prepare_i2v_conditioning(self, video01, mask255):
        """(video in [0,1] [B,3,T,H,W], mask [B,1,T,H,W] 255=generate) ->
        y [B, 4+z, Tl, h, w]: the Wan-i2v channel layout the i2v DiT
        consumes (in_dim = z + 4 + z, `wan_transformer3d.py:866-867`;
        WAN21_I2V_14B in_dim 36). Track 1 is the keep-mask with the first
        frame's flag repeated 4x then folded into the temporal compression;
        track 2 is the VAE mode of the conditioning video (generate-region
        frames zeroed, i.e. pixel value 0 -> -1 after normalization is NOT
        used — the masked frames are mid-gray 0 in [-1,1] space)."""
        video01 = jnp.asarray(video01, jnp.float32)
        mask255 = jnp.asarray(mask255, jnp.float32)
        B, _, T, H, W = video01.shape
        tc = self.vae_cfg.temporal_compression_ratio
        sc = self.vae_cfg.spatial_compression_ratio
        Tl, h, w = latent_frame_count(T, tc), H // sc, W // sc
        keep = 1.0 - mask255 / 255.0                     # 1 = conditioned
        cond_vid = (video01 * 2.0 - 1.0) * keep          # zeros where free
        y_lat = self.vae_encode(cond_vid).astype(jnp.float32)
        # per-frame keep flags -> latent-time 4-channel mask (the official
        # Wan i2v msk fold: frame 0 repeated 4x, then [T+3] -> [Tl, 4])
        flags = keep[:, 0].max(axis=(2, 3))              # [B, T]
        flags = jnp.concatenate(
            [jnp.repeat(flags[:, :1], tc, axis=1), flags[:, 1:]], axis=1)
        msk = flags.reshape(B, Tl, tc).transpose(0, 2, 1)  # [B, 4, Tl]
        msk = jnp.broadcast_to(msk[:, :, :, None, None], (B, tc, Tl, h, w))
        return jnp.concatenate([msk, y_lat], axis=1)

    def image_to_video(
        self,
        start_image,
        prompt: Union[str, Sequence[str]],
        *,
        end_image=None,
        num_frames: int = 33,
        height: int = 480,
        width: int = 832,
        negative_prompt: str = "",
        num_inference_steps: int = 40,
        guidance_scale: float = 5.0,
        shift: float = 5.0,
        sampler: str = "unipc",
        seed: int = 0,
        max_sequence_length: int = 512,
        clip_params=None,
        clip_cfg=None,
        clip_fea: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
        output_latents: bool = False,
        solver_order: Optional[int] = None,
    ) -> WanPipelineOutput:
        """Image-to-video: animate ``start_image`` (path / array / PIL; an
        optional ``end_image`` pins the last frame). Consumes an i2v DiT
        (model_type 'i2v': channel-concat conditioning + CLIP image tokens —
        `wan_transformer3d.py:339-393,551-563,866-867,944-946`). The
        reference snapshot's own i2v UI path is dangling (its inpaint
        pipeline file is absent), so this follows the published Wan2.1-i2v
        conditioning convention the checkpoints were trained with.

        ``clip_fea`` may be precomputed [B, 257, 1280]; otherwise pass
        ``clip_params``/``clip_cfg`` (models/clip_vision) to encode the
        start image, or leave both None to run without image tokens."""
        from ..utils import video_io as vio

        video01, mask255, clip_img = vio.get_image_to_video_latent(
            start_image, end_image, num_frames, (height, width))
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        if len(prompts) != 1:
            # the conditioning stream is built for ONE start image; a multi-
            # prompt batch would mismatch context rows against latent batch
            raise ValueError(
                f"image_to_video takes exactly one prompt per call, got "
                f"{len(prompts)}")
        B = 1
        do_cfg = guidance_scale > 1.0

        embeds = self.encode_prompt(prompts, max_sequence_length)
        if do_cfg:
            neg = self.encode_prompt([negative_prompt] * B,
                                     max_sequence_length)
            context = jnp.concatenate([neg, embeds], axis=0)
        else:
            context = embeds
        context = context.astype(self.dtype)

        y = self.prepare_i2v_conditioning(video01, mask255)
        if clip_fea is None and clip_params is not None and clip_img is not None:
            from ..models import clip_vision as cv
            frames = jnp.asarray(np.asarray(clip_img), jnp.float32)[None]
            frames = frames.transpose(0, 3, 1, 2) / 255.0   # [1,3,H,W] 0..1
            pre = cv.preprocess_frames(frames, clip_cfg)
            clip_fea = cv.clip_vision_forward(clip_params, clip_cfg, pre)
        if clip_fea is not None:
            clip_fea = jnp.asarray(clip_fea, self.dtype)

        tc = self.vae_cfg.temporal_compression_ratio
        Tl = latent_frame_count(num_frames, tc)
        h, w = y.shape[3], y.shape[4]
        key = jax.random.PRNGKey(seed)
        if noise is None:
            latents = jax.random.normal(
                key, (B, self.vae_cfg.z_dim, Tl, h, w), jnp.float32)
        else:
            latents = jnp.asarray(noise, jnp.float32)

        ph, pw = self.dit_cfg.patch_size[1:]
        grid = (Tl, h // ph, w // pw)
        rope_key = (grid, None, 0, None, None, None)
        if rope_key in self._rope_cache:
            cos, sin = self._rope_cache[rope_key]
        else:
            cos, sin = wan_dit.make_rope_for_geometry(self.dit_cfg, grid)
            cos, sin = jnp.asarray(cos), jnp.asarray(sin)
            self._rope_cache[rope_key] = (cos, sin)

        sched_kw = ({"solver_order": solver_order}
                    if solver_order is not None
                    and sampler in ("unipc", "dpm++") else {})
        sched = get_scheduler(sampler, **sched_kw)
        sched.set_timesteps(num_inference_steps, shift=shift)

        from .fused_sampler import estimate_step_seconds, make_fused_sample_fn
        L_tok = grid[0] * grid[1] * grid[2]
        est = num_inference_steps * estimate_step_seconds(
            L_tok, do_cfg, dit_cfg=self.dit_cfg)
        fkey = ("i2v_fused", sampler, num_inference_steps, float(shift),
                do_cfg, float(guidance_scale), self._backend_for(do_cfg),
                tuple(latents.shape), tuple(context.shape),
                clip_fea is not None, solver_order)
        if est <= 45.0:
            # fused trajectory: the whole i2v denoise as one scan (the
            # conditioning operands are step-invariant)
            if fkey not in self._jit_cache:
                self._jit_cache[fkey] = make_fused_sample_fn(
                    self.dit_cfg, sampler, sched.plan_arrays(), do_cfg,
                    guidance_scale, 0, self.dtype,
                    attn_backend=self._backend_for(do_cfg),
                    sp=self._sp_for(do_cfg))
            latents = self._jit_cache[fkey](self.dit_params, latents,
                                            context, cos, sin,
                                            clip_fea=clip_fea, y=y)
        else:
            skey = ("i2v_step", do_cfg, float(guidance_scale),
                    self._backend_for(do_cfg), clip_fea is not None)
            if skey not in self._jit_cache:
                dit_cfg, dtype = self.dit_cfg, self.dtype
                backend = self._backend_for(do_cfg)
                sp = self._sp_for(do_cfg)

                @jax.jit
                def step(p, lat, t_scalar, ctx, rc, rs, cf, yy):
                    if do_cfg:
                        x = jnp.concatenate([lat, lat], axis=0)
                        cf2 = (None if cf is None
                               else jnp.concatenate([cf, cf], axis=0))
                        yy2 = jnp.concatenate([yy, yy], axis=0)
                    else:
                        x, cf2, yy2 = lat, cf, yy
                    t = jnp.full((x.shape[0],), t_scalar, jnp.float32)
                    v, _ = wan_dit.wan_dit_forward_with_residual(
                        p, dit_cfg, x.astype(dtype), t, ctx, rc, rs,
                        attn_backend=backend, sp=sp, clip_fea=cf2, y=yy2)
                    if do_cfg:
                        vu, vc = jnp.split(v, 2, axis=0)
                        v = vu + guidance_scale * (vc - vu)
                    return v

                self._jit_cache[skey] = step
            step = self._jit_cache[skey]
            state = sched.init_state(latents)
            sk = ("sched", sampler, num_inference_steps, float(shift),
                  solver_order)
            if sk not in self._jit_cache:
                self._jit_cache[sk] = jax.jit(sched.step, static_argnums=(1,))
            sstep = self._jit_cache[sk]
            for i in range(num_inference_steps):
                v = step(self.dit_params, latents,
                         float(sched.timesteps[i]), context, cos, sin,
                         clip_fea, y)
                latents, state = sstep(v, i, latents, state)

        video = self.decode_to_numpy01(latents)
        out = WanPipelineOutput(videos=video, edit_videos=video)
        if output_latents:
            out.latents = np.asarray(latents)
        return out

    # ------------------------------------------------------- text-to-video
    def text_to_video(
        self,
        prompt: Union[str, Sequence[str]],
        *,
        negative_prompt: str = "",
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        shift: float = 5.0,
        sampler: str = "unipc",
        seed: int = 0,
        max_sequence_length: int = 512,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
        fused_sampling: Optional[bool] = None,
        output_latents: bool = False,
        solver_order: Optional[int] = None,
        enable_teacache: bool = False,
        teacache_threshold: float = 0.10,
        teacache_skip_start_steps: int = 5,
        teacache_coefficients=None,
        teacache_forced_plan=None,
        cfg_skip_ratio: float = 0.0,
    ) -> WanPipelineOutput:
        """Plain text-to-video (no source video, no CoF): noise latents ->
        denoise -> whole-sequence decode, the reference `Wan2_2Pipeline`
        flow (`pipeline_wan2_2.py:388-599`: prepare_latents from
        randn_tensor, CFG combine `:552-558`, decode_latents `:293-298`).
        Standard (non-repeat) RoPE; no source freeze. TeaCache and cfg-skip
        apply the same way as on the editing path. `Wan22Pipeline`
        overrides with dual-expert boundary routing."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        B = len(prompts)
        do_cfg = guidance_scale > 1.0

        embeds = (jnp.asarray(prompt_embeds) if prompt_embeds is not None
                  else self.encode_prompt(prompts, max_sequence_length))
        if do_cfg:
            neg = (jnp.asarray(negative_prompt_embeds)
                   if negative_prompt_embeds is not None
                   else self.encode_prompt([negative_prompt] * B,
                                           max_sequence_length))
            context = jnp.concatenate([neg, embeds], axis=0)
        else:
            context = embeds
        context = context.astype(self.dtype)

        tc = self.vae_cfg.temporal_compression_ratio
        sc = self.vae_cfg.spatial_compression_ratio
        Tl = latent_frame_count(num_frames, tc)
        Hl, Wl = height // sc, width // sc
        if noise is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed),
                (B, self.vae_cfg.z_dim, Tl, Hl, Wl), jnp.float32)
        else:
            latents = jnp.asarray(noise, jnp.float32)

        ph, pw = self.dit_cfg.patch_size[1:]
        grid = (Tl, Hl // ph, Wl // pw)
        rope_key = (grid, None, 0, None, None, None)
        if rope_key in self._rope_cache:
            cos, sin = self._rope_cache[rope_key]
        else:
            cos, sin = wan_dit.make_rope_for_geometry(self.dit_cfg, grid)
            cos, sin = jnp.asarray(cos), jnp.asarray(sin)
            self._rope_cache[rope_key] = (cos, sin)

        sched_kw = ({"solver_order": solver_order}
                    if solver_order is not None
                    and sampler in ("unipc", "dpm++") else {})
        sched = get_scheduler(sampler, **sched_kw)
        sched.set_timesteps(num_inference_steps, shift=shift)

        tc_kw = dict(enable_teacache=enable_teacache,
                     teacache_threshold=teacache_threshold,
                     teacache_skip_start_steps=teacache_skip_start_steps,
                     teacache_coefficients=teacache_coefficients,
                     teacache_forced_plan=teacache_forced_plan,
                     cfg_skip_ratio=cfg_skip_ratio)
        latents = self._t2v_denoise(latents, context, cos, sin, sched,
                                    sampler, num_inference_steps, shift,
                                    do_cfg, guidance_scale, fused_sampling,
                                    solver_order, **tc_kw)
        video = self.decode_to_numpy01(latents)
        out = WanPipelineOutput(videos=video, edit_videos=video)
        if output_latents:
            out.latents = np.asarray(latents)
        return out

    def _plan_t2v_teacache(self, sched, num_inference_steps,
                           enable_teacache, teacache_threshold,
                           teacache_skip_start_steps, teacache_coefficients,
                           teacache_forced_plan, do_cfg, cfg_skip_ratio):
        """(skip_mask | None, cfg_off | None) for a t2v trajectory —
        the same host-side planning as the editing path."""
        cfg_off = None
        if do_cfg and cfg_skip_ratio > 0.0:
            cfg_off = num_inference_steps - int(
                round(num_inference_steps * cfg_skip_ratio))
        skip_mask = None
        if enable_teacache and teacache_forced_plan is not None:
            assert len(teacache_forced_plan) == num_inference_steps
            plan = [bool(s) for s in teacache_forced_plan]
            plan[0] = False
            skip_mask = tuple(plan)
        elif enable_teacache:
            from ..models import teacache as tc
            coeffs = (teacache_coefficients or
                      tc.TEACACHE_COEFFICIENTS["wan2.1-t2v-14b"])
            skip_mask = tuple(tc.plan_teacache_skips(
                self.dit_params, self.dit_cfg, sched.timesteps, coeffs,
                teacache_threshold, teacache_skip_start_steps))
        return skip_mask, cfg_off

    def _t2v_denoise(self, latents, context, cos, sin, sched, sampler,
                     num_inference_steps, shift, do_cfg, guidance_scale,
                     fused_sampling, solver_order, **tc_kw):
        """Single-expert t2v trajectory dispatch: fused when it fits the
        worker's program window (TeaCache + cfg-skip COMBINED goes
        segmented, same rule as the editing path), segmented otherwise,
        per-step loop for samplers without a fused rule
        (condition_count=0 — nothing is frozen)."""
        from .fused_sampler import (auto_segment_steps,
                                    estimate_step_seconds,
                                    make_fused_sample_fn,
                                    make_segmented_sample_fn)
        skip_mask, cfg_off = self._plan_t2v_teacache(
            sched, num_inference_steps,
            tc_kw.get("enable_teacache", False),
            tc_kw.get("teacache_threshold", 0.10),
            tc_kw.get("teacache_skip_start_steps", 5),
            tc_kw.get("teacache_coefficients"),
            tc_kw.get("teacache_forced_plan"),
            do_cfg, tc_kw.get("cfg_skip_ratio", 0.0))
        can_fuse = not (skip_mask is not None and cfg_off is not None)
        if do_cfg and self.cfg_sequential:
            can_fuse = False  # sequential CFG is a two-dispatch step
        backend = self._backend_for(do_cfg)
        L_tok = cos.shape[0] if cos.ndim == 2 else (
            latents.shape[2] * (latents.shape[3] // 2)
            * (latents.shape[4] // 2))
        if fused_sampling is None:
            est = num_inference_steps * estimate_step_seconds(
                L_tok, do_cfg, dit_cfg=self.dit_cfg)
            fused_sampling = est <= 45.0
        fkey = ("t2v_fused", sampler, num_inference_steps, float(shift),
                do_cfg, float(guidance_scale), backend, skip_mask, cfg_off,
                tuple(latents.shape), tuple(context.shape), solver_order)
        if fused_sampling and can_fuse:
            if fkey not in self._jit_cache:
                self._jit_cache[fkey] = make_fused_sample_fn(
                    self.dit_cfg, sampler, sched.plan_arrays(), do_cfg,
                    guidance_scale, 0, self.dtype, attn_backend=backend,
                    sp=self._sp_for(do_cfg),
                    skip_mask=skip_mask, cfg_off_after=cfg_off)
            return self._jit_cache[fkey](self.dit_params, latents, context,
                                         cos, sin)
        import os as _os
        if (_os.environ.get("VIDEOCOF_STEPWISE") != "1"
                and sampler in ("unipc", "dpm++", "euler")
                and not (do_cfg and self.cfg_sequential)):
            seg_env = _os.environ.get("VIDEOCOF_SEG_STEPS")
            seg_n = max(1, int(seg_env)) if seg_env else auto_segment_steps(
                L_tok, do_cfg, dit_cfg=self.dit_cfg)
            skey = ("t2v_seg", sampler, num_inference_steps, float(shift),
                    do_cfg, float(guidance_scale), backend, skip_mask,
                    cfg_off, seg_n, solver_order)
            if skey not in self._jit_cache:
                self._jit_cache[skey] = make_segmented_sample_fn(
                    self.dit_cfg, sampler, sched.plan_arrays(), do_cfg,
                    guidance_scale, 0, self.dtype, attn_backend=backend,
                    sp=self._sp_for(do_cfg), segment_steps=seg_n,
                    skip_mask=skip_mask, cfg_off_after=cfg_off)
            return self._jit_cache[skey](self.dit_params, latents, context,
                                         cos, sin)
        state = sched.init_state(latents)
        sk = ("sched", sampler, num_inference_steps, float(shift),
              solver_order)
        if sk not in self._jit_cache:
            self._jit_cache[sk] = jax.jit(sched.step, static_argnums=(1,))
        sstep = self._jit_cache[sk]
        skips = (list(skip_mask) if skip_mask is not None
                 else [False] * num_inference_steps)
        residual = None
        for i in range(num_inference_steps):
            step_cfg = do_cfg and (cfg_off is None or i < cfg_off)
            ctx_i = context
            if do_cfg and not step_cfg:
                ctx_i = context[context.shape[0] // 2:]  # cond rows
            res_in = None
            if skips[i]:
                res_in = residual
                need = latents.shape[0] * (2 if step_cfg else 1)
                if res_in.shape[0] != need:
                    res_in = res_in[-need:]  # cond rows (ref [-B:])
            step = self._step_fn(step_cfg, guidance_scale, 0,
                                 skip_blocks=skips[i])
            v, res = step(self.dit_params, latents,
                          float(sched.timesteps[i]), ctx_i, cos, sin,
                          res_in)
            if not skips[i]:
                residual = res
            latents, state = sstep(v, i, latents, state)
        return latents

    # -------------------------------------------------- AOT fused precompile
    def precompile_fused(self, *, height: int, width: int,
                         source_frames: int = 33, reasoning_frames: int = 4,
                         num_inference_steps: int = 4,
                         guidance_scale: float = 1.0, shift: float = 3.0,
                         sampler: str = "unipc", batch: int = 1,
                         max_sequence_length: int = 512,
                         dit_param_abstract=None, scan_unroll: int = 1,
                         layouts: str = "default", cot: bool = True):
        """AOT-compile the fused denoise executable for one geometry and
        return the DiT params' expected input Formats.

        ``layouts``: argument-layout mode for the lowering.
          * "default" (the production recipe, `scripts/probe_14b_e2e.py`):
            plain default layouts; `ship_tree_into`/`device_put_into`
            verify-and-fix the few leaves XLA still wants non-default
            (blocks modulation, head fc). Costs ~1.7% step time vs the
            AUTO pick but its input_formats are REPRODUCIBLE — AUTO
            formats deserialized through the persistent compile cache have
            been observed inconsistent with what the call requires (both
            directions; see CLAUDE.md), and the factory enables that cache.
          * "auto": XLA picks compute-preferred argument layouts. For a
            one-program trajectory this removes hoisted relayout copies of
            multi-use stacked weight leaves (measured temp 3.6 -> 2.0 GiB
            on the 14B) — use for experimentation WITHOUT the persistent
            cache.

        ``scan_unroll``: unroll factor for the scan over steps (kept for
        experimentation).

        The point (see utils/layouts.py): weights that cross executables in
        the wrong layout get relayout-COPIED at dispatch — fatal for a
        13.8 GiB fp8 14B on a 16 GB chip. Compile the consumer first (this
        method works from abstract shapes, so no weights need to be
        resident), ship the weights into the returned formats
        (`utils.layouts.ship_tree_into`), and `__call__` at the same
        geometry reuses the executable. ``dit_param_abstract``: pytree of
        ShapeDtypeStructs (e.g. `jax.eval_shape` over the host tree);
        defaults to the current `self.dit_params` shapes."""
        from .fused_sampler import make_fused_sample_fn

        do_cfg = guidance_scale > 1.0
        tc = self.vae_cfg.temporal_compression_ratio
        sc = self.vae_cfg.spatial_compression_ratio
        cond = latent_frame_count(source_frames, tc)
        ground = latent_frame_count(reasoning_frames, tc) if cot else 0
        Tl = cond + ground + cond
        Hl, Wl = height // sc, width // sc
        ph, pw = self.dit_cfg.patch_size[1:]
        grid = (Tl, Hl // ph, Wl // pw)

        cos, sin = wan_dit.make_rope_for_geometry(
            self.dit_cfg, grid, f_src=cond, f_ground=ground)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        self._rope_cache[(grid, cond, ground, None, None, None)] = (cos, sin)

        sched = get_scheduler(sampler)
        sched.set_timesteps(num_inference_steps, shift=shift)
        sp = self._sp_for(do_cfg)
        fn = make_fused_sample_fn(
            self.dit_cfg, sampler, sched.plan_arrays(), do_cfg,
            guidance_scale, cond, self.dtype,
            attn_backend=self._backend_for(do_cfg), sp=sp,
            scan_unroll=scan_unroll)

        p_abs = (dit_param_abstract if dit_param_abstract is not None
                 else jax.eval_shape(lambda p: p, self.dit_params))
        lat_abs = jax.ShapeDtypeStruct(
            (batch, self.vae_cfg.z_dim, Tl, Hl, Wl), jnp.float32)
        ctx_abs = jax.ShapeDtypeStruct(
            (batch * (2 if do_cfg else 1), max_sequence_length,
             self.dit_cfg.text_dim), self.dtype)
        if layouts == "auto":
            from jax.experimental.layout import Format, Layout
            fn_jit = jax.jit(fn, in_shardings=Format(Layout.AUTO))
        else:
            fn_jit = jax.jit(fn)
        compiled = fn_jit.lower(p_abs, lat_abs, ctx_abs, cos,
                                sin).compile()
        fmts = compiled.input_formats[0]

        def runner(p, lat, ctx, rc, rs):
            # non-param inputs are tiny: normalize their formats at call
            return compiled(p, jax.device_put(lat, fmts[1]),
                            jax.device_put(ctx, fmts[2]),
                            jax.device_put(rc, fmts[3]),
                            jax.device_put(rs, fmts[4]))

        # the key carries the compiled geometry: the runner is
        # shape-locked AOT code, and a call at any other resolution /
        # frame count / batch must fall back to plain jit, not crash.
        # Built by the ONE shared key builder (fused_sampler.fused_cache_key)
        # so it mirrors the __call__-side key by construction — a mismatch
        # would silently bypass this runner and relayout-copy the shipped
        # weights. tests/test_fp8.py pins the reuse.
        from .fused_sampler import fused_cache_key
        runner.is_aot = True  # dispatch-side hit counter (VIDEOCOF_TIMING)
        fkey = fused_cache_key(
            "fused", sampler=sampler,
            num_inference_steps=num_inference_steps, shift=shift,
            do_cfg=do_cfg, guidance_scale=guidance_scale,
            condition_count=cond, backend=self._backend_for(do_cfg),
            latents_shape=lat_abs.shape, context_shape=ctx_abs.shape)
        self._jit_cache[fkey] = runner
        return fmts[0]

    # ------------------------------------------------------------- jitted step
    def _step_fn(self, do_cfg: bool, guidance_scale: float,
                 condition_count: int, skip_blocks: bool = False):
        """One denoise step: optional CFG batch-doubling, DiT forward (with
        TeaCache residual in/out), guidance combine, source freeze. Compiled
        once per (cfg, skip) variant."""
        if do_cfg and self.cfg_sequential:
            return self._seq_cfg_step_fn(guidance_scale, condition_count,
                                         skip_blocks)
        key = ("step", do_cfg, float(guidance_scale), condition_count,
               skip_blocks, self._backend_for(do_cfg))
        if key in self._jit_cache:
            return self._jit_cache[key]

        dit_cfg = self.dit_cfg
        backend = self._backend_for(do_cfg)
        sp = self._sp_for(do_cfg)

        @jax.jit
        def step(dit_params, latents, t_scalar, context, rope_cos, rope_sin,
                 residual):
            if do_cfg:
                x = jnp.concatenate([latents, latents], axis=0)
                ctx = context  # [2B, ...] (uncond first, then cond)
                if sp is not None and sp.cfg_parallel:
                    # cond/uncond split over the data axis
                    # (ref `dist/fuser.py:35-49`)
                    x = sp.shard_batch(x)
                    ctx = sp.shard_batch(ctx)
            else:
                x = latents
                ctx = context
            t = jnp.full((x.shape[0],), t_scalar, jnp.float32)
            v, res = wan_dit.wan_dit_forward_with_residual(
                dit_params, dit_cfg, x.astype(self.dtype), t, ctx,
                rope_cos, rope_sin, attn_backend=backend,
                residual=residual, skip_blocks=skip_blocks, sp=sp)
            if do_cfg:
                vu, vc = jnp.split(v, 2, axis=0)
                v = vu + guidance_scale * (vc - vu)
            # freeze source latents (`pipeline_wan.py:735-737`)
            v = v.at[:, :, :condition_count].set(0.0)
            return v, res

        self._jit_cache[key] = step
        return step

    def _seq_cfg_step_fn(self, guidance_scale: float, condition_count: int,
                         skip_blocks: bool):
        """Sequential-CFG step: both guidance branches through the SAME
        batch-B no-cfg executable (source freeze is linear, so freezing
        before the combine is exact), combined on device. Residuals concat
        [uncond | cond] so the callers' cfg-skip slice (``res_in[-need:]``
        keeps cond rows) works unchanged."""
        key = ("seq_step", float(guidance_scale), condition_count,
               skip_blocks, self.attn_backend)
        if key in self._jit_cache:
            return self._jit_cache[key]
        base = self._step_fn(False, 1.0, condition_count,
                             skip_blocks=skip_blocks)
        g = float(guidance_scale)
        combine = jax.jit(lambda vu, vc: vu + g * (vc - vu))
        cat = jax.jit(lambda a, b: jnp.concatenate([a, b], axis=0))

        def step(dit_params, latents, t_scalar, context, rope_cos,
                 rope_sin, residual):
            B = latents.shape[0]
            ru = rc = None
            if residual is not None:
                ru, rc = residual[:B], residual[B:]
            vu, res_u = base(dit_params, latents, t_scalar, context[:B],
                             rope_cos, rope_sin, ru)
            vc, res_c = base(dit_params, latents, t_scalar, context[B:],
                             rope_cos, rope_sin, rc)
            return combine(vu, vc), cat(res_u, res_c)

        self._jit_cache[key] = step
        return step

    # ------------------------------------------------------------------- call
    def __call__(
        self,
        video: Union[np.ndarray, jax.Array],
        prompt: Union[str, Sequence[str]],
        negative_prompt: str = "",
        source_frames: int = 33,
        reasoning_frames: int = 4,
        num_inference_steps: int = 4,
        guidance_scale: float = 1.0,
        shift: float = 3.0,
        sampler: str = "unipc",
        repeat_rope: bool = True,
        cot: bool = True,
        seed: int = 0,
        max_sequence_length: int = 512,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        enable_teacache: bool = False,
        teacache_threshold: float = 0.10,
        teacache_skip_start_steps: int = 5,
        teacache_coefficients: Optional[Sequence[float]] = None,
        teacache_forced_plan: Optional[Sequence[bool]] = None,
        cfg_skip_ratio: float = 0.0,
        riflex_k: Optional[int] = None,
        riflex_L_test: Optional[int] = None,
        riflex_L_test_scale: Optional[float] = None,
        fused_sampling: Optional[bool] = None,
        noise: Optional[Union[np.ndarray, jax.Array]] = None,
        latents: Optional[Union[np.ndarray, jax.Array]] = None,
        output_latents: bool = False,
        solver_order: Optional[int] = None,
    ) -> WanPipelineOutput:
        """Edit ``video`` ([B, 3, T, H, W] in [-1, 1]) per ``prompt``.

        Mirrors `WanPipeline.__call__` defaults/semantics; `num_frames` of the
        reference is ignored on the CoT path there too (`pipeline_wan.py:630-651`).

        ``video`` may be float in [-1, 1] or uint8 in [0, 255]; uint8 crosses
        the host->device link 4x cheaper and is normalized on device.

        ``latents`` skips latent preparation entirely (the reference's
        `latents` passthrough — `pipeline_wan.py:399-402`); ``noise``
        overrides only the PRNG draw inside latent prep (reference
        `randn_tensor`), keeping the VAE-encode glue on the hot path —
        the hook the end-to-end reference-parity oracle drives.
        ``output_latents=True`` attaches the final denoised latents to the
        output.
        """
        import time as _time
        _t0 = _time.perf_counter()

        def _tick(label, block_on=None):
            nonlocal _t0
            if self.verbose_timing:
                import sys as _sys
                if block_on is not None:
                    jax.block_until_ready(block_on)
                now = _time.perf_counter()
                print(f"[pipeline] {label}: {now - _t0:.2f}s",
                      file=_sys.stderr, flush=True)
                _t0 = now

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        # the CoT path's fused latent prep normalizes u8 in-program
        video = self._prepare_video(video, prompts,
                                    convert=not (cot and latents is None))
        B = video.shape[0]

        do_cfg = guidance_scale > 1.0
        tc = self.vae_cfg.temporal_compression_ratio
        condition_count = latent_frame_count(source_frames, tc)
        ground_latent_count = latent_frame_count(reasoning_frames, tc) if cot else 0

        # ---- text (precomputed embeds supported like the reference's
        # `prompt_embeds` kwarg — `pipeline_wan.py:535-536`)
        embeds = (jnp.asarray(prompt_embeds) if prompt_embeds is not None
                  else self.encode_prompt(prompts, max_sequence_length))
        if do_cfg:
            neg = (jnp.asarray(negative_prompt_embeds)
                   if negative_prompt_embeds is not None
                   else self.encode_prompt([negative_prompt] * B,
                                           max_sequence_length))
            context = jnp.concatenate([neg, embeds], axis=0)  # uncond first
        else:
            context = embeds
        context = context.astype(self.dtype)
        _tick("text", context)

        # ---- latents
        key = jax.random.PRNGKey(seed)
        if latents is not None:
            latents = jnp.asarray(latents, jnp.float32)
        elif cot:
            latents = self.prepare_cot_latents(video, ground_latent_count,
                                               key, noise=noise)
        else:
            latents = self.prepare_paired_latents(video, key, noise=noise)
        _, C, Tl, Hl, Wl = latents.shape
        _tick("encode+latents", latents)

        # ---- rope (CoF positions as data; optional RIFLEx temporal table —
        # `wan_transformer3d.py:775-800`)
        ph, pw = self.dit_cfg.patch_size[1:]
        grid = (Tl, Hl // ph, Wl // pw)
        f_src = condition_count if (repeat_rope) else None
        f_ground = ground_latent_count if (repeat_rope and cot) else 0
        rope_key = (grid, f_src, f_ground, riflex_k, riflex_L_test,
                    riflex_L_test_scale)
        if rope_key in self._rope_cache:
            cos, sin = self._rope_cache[rope_key]
        else:
            temporal_table = None
            if riflex_k is not None:
                from ..models.rope import riflex_angle_table
                temporal_table = riflex_angle_table(
                    self.dit_cfg.head_dim, riflex_k, riflex_L_test or 66,
                    riflex_L_test_scale, max_pos=self.dit_cfg.rope_max_pos,
                    theta=self.dit_cfg.rope_theta)
            cos, sin = wan_dit.make_rope_for_geometry(
                self.dit_cfg, grid, f_src=f_src, f_ground=f_ground,
                temporal_table=temporal_table)
            cos, sin = jnp.asarray(cos), jnp.asarray(sin)
            self._rope_cache[rope_key] = (cos, sin)
        _tick("rope", (cos, sin))

        # ---- sampler (`solver_order` reaches the multistep solvers only —
        # reference `fm_solvers_unipc.py:80` / `fm_solvers.py:132` cap at 3)
        sched_kw = ({"solver_order": solver_order}
                    if solver_order is not None
                    and sampler in ("unipc", "dpm++") else {})
        sched = get_scheduler(sampler, **sched_kw)
        sched.set_timesteps(num_inference_steps, shift=shift)
        state = sched.init_state(latents)

        # ---- fused path: the whole trajectory as one compiled scan.
        # Default for everything except TeaCache+cfg-skip COMBINED (their
        # residual shapes disagree across the cfg split): a TeaCache
        # schedule fuses via a carried residual + per-step cond (the plan is
        # data-independent), and cfg-skip fuses as a static two-phase split
        # (CFG steps, then cond-only steps — carry shape is unchanged).
        cfg_off = None
        if do_cfg and cfg_skip_ratio > 0.0:
            cfg_off = num_inference_steps - int(
                round(num_inference_steps * cfg_skip_ratio))
        can_fuse = not (enable_teacache and cfg_off is not None)
        if do_cfg and self.cfg_sequential:
            can_fuse = False  # sequential CFG is a two-dispatch step
        fkey = None
        if can_fuse:
            skip_mask = None
            if enable_teacache and teacache_forced_plan is not None:
                # benchmarking/debug hook: pin the skip schedule (random
                # weights skip ~90% of steps at the trained-weight threshold,
                # so honest TeaCache timing injects a realistic ~40% plan)
                assert len(teacache_forced_plan) == num_inference_steps
                plan = [bool(s) for s in teacache_forced_plan]
                plan[0] = False  # step 0 has no residual to replay
                skip_mask = tuple(plan)
            elif enable_teacache:
                from ..models import teacache as tcache
                coeffs = (teacache_coefficients or
                          tcache.TEACACHE_COEFFICIENTS["wan2.1-t2v-14b"])
                skip_mask = tuple(tcache.plan_teacache_skips(
                    self.dit_params, self.dit_cfg, sched.timesteps, coeffs,
                    teacache_threshold, teacache_skip_start_steps))
            backend = self._backend_for(do_cfg)
            from .fused_sampler import fused_cache_key
            fkey = fused_cache_key(
                "fused", sampler=sampler,
                num_inference_steps=num_inference_steps, shift=shift,
                do_cfg=do_cfg, guidance_scale=guidance_scale,
                condition_count=condition_count, backend=backend,
                latents_shape=latents.shape, context_shape=context.shape,
                skip_mask=skip_mask, cfg_off=cfg_off,
                solver_order=solver_order)
        if fused_sampling is None:
            if not can_fuse:
                fused_sampling = False   # residual shapes disagree (below)
            elif fkey in self._jit_cache:
                # a precompiled AOT runner exists for exactly this geometry:
                # always use it — the weights were shipped into ITS input
                # formats, and re-jitting elsewhere would relayout-copy the
                # whole tree (OOM-fatal for the 14B, see utils/layouts.py)
                fused_sampling = True
            else:
                # one-program trajectories longer than the remote worker's
                # program-kill window must go segmented (measured: a 50-step
                # fused CFG run crashed the worker 3/3; ~40 s programs
                # survive) — the same wall model that sizes the segments
                from .fused_sampler import estimate_step_seconds
                L_tok = Tl * (Hl // ph) * (Wl // pw)
                est_total = num_inference_steps * estimate_step_seconds(
                    L_tok, do_cfg, dit_cfg=self.dit_cfg)
                fused_sampling = est_total <= 45.0
        if fused_sampling and can_fuse:
            if fkey not in self._jit_cache:
                from .fused_sampler import make_fused_sample_fn
                sp = self._sp_for(do_cfg)
                self._jit_cache[fkey] = make_fused_sample_fn(
                    self.dit_cfg, sampler, sched.plan_arrays(), do_cfg,
                    guidance_scale, condition_count, self.dtype,
                    attn_backend=backend, sp=sp,
                    skip_mask=skip_mask, cfg_off_after=cfg_off)
            fused_fn = self._jit_cache[fkey]
            is_aot = getattr(fused_fn, "is_aot", False)
            if is_aot:
                self.aot_runner_hits += 1
            latents = fused_fn(self.dit_params, latents, context, cos, sin)
            _tick("denoise(fused, AOT runner)" if is_aot
                  else "denoise(fused)", latents)
            out = self._decode_outputs(latents, cot, condition_count,
                                       ground_latent_count)
            if output_latents:
                out.latents = np.asarray(latents)
            _tick("decode")
            return out

        # ---- TeaCache plan (fully precomputable: the skip signal depends
        # only on the timestep schedule — see models/teacache.py)
        skips = [False] * num_inference_steps
        if enable_teacache and teacache_forced_plan is not None:
            assert len(teacache_forced_plan) == num_inference_steps
            skips = [bool(s) for s in teacache_forced_plan]
            skips[0] = False  # step 0 has no residual to replay
        elif enable_teacache:
            from ..models import teacache as tc
            coeffs = (teacache_coefficients or
                      tc.TEACACHE_COEFFICIENTS["wan2.1-t2v-14b"])
            skips = tc.plan_teacache_skips(
                self.dit_params, self.dit_cfg, sched.timesteps, coeffs,
                teacache_threshold, teacache_skip_start_steps)

        # ---- cfg-skip: drop the uncond pass in the last fraction of steps
        # (`utils/cfg_optimization.py:7-37`)
        cfg_off_after = num_inference_steps - int(
            round(num_inference_steps * cfg_skip_ratio))

        # ---- segmented fused trajectory (default when the one-program
        # fused path was declined): K steps per dispatch — recovers the
        # fused scan's one-dispatch-per-K efficiency (the per-step loop
        # below pays TWO tunnel dispatches per step) while every segment
        # stays far below the remote worker's multi-minute program killer.
        # Composes with TeaCache AND cfg-skip (the residual's batch slice
        # at the phase boundary happens between segments).
        import os as _os
        use_seg = (_os.environ.get("VIDEOCOF_STEPWISE") != "1"
                   and sampler in ("unipc", "dpm++", "euler")
                   and not (enable_teacache and skips[0])
                   and not (do_cfg and self.cfg_sequential))
        if use_seg:
            from .fused_sampler import (auto_segment_steps,
                                        make_segmented_sample_fn)
            L_tok = (latents.shape[2] * (latents.shape[3] // 2)
                     * (latents.shape[4] // 2))
            seg_env = _os.environ.get("VIDEOCOF_SEG_STEPS")
            seg_n = int(seg_env) if seg_env else auto_segment_steps(
                L_tok, do_cfg, dit_cfg=self.dit_cfg)
            backend = self._backend_for(do_cfg)
            skey = ("seg", sampler, num_inference_steps, float(shift),
                    do_cfg, float(guidance_scale), condition_count,
                    tuple(skips) if enable_teacache else None,
                    cfg_off_after if cfg_skip_ratio > 0.0 else None,
                    backend, seg_n, solver_order)
            if skey not in self._jit_cache:
                sp = self._sp_for(do_cfg)
                self._jit_cache[skey] = make_segmented_sample_fn(
                    self.dit_cfg, sampler, sched.plan_arrays(), do_cfg,
                    guidance_scale, condition_count, self.dtype,
                    attn_backend=backend, sp=sp,
                    skip_mask=(tuple(skips) if enable_teacache else None),
                    cfg_off_after=(cfg_off_after if cfg_skip_ratio > 0.0
                                   else None),
                    segment_steps=seg_n)
            latents = self._jit_cache[skey](self.dit_params, latents,
                                            context, cos, sin)
            _tick("denoise(segmented)", latents)
            out = self._decode_outputs(latents, cot, condition_count,
                                       ground_latent_count)
            if output_latents:
                out.latents = np.asarray(latents)
            _tick("decode")
            return out

        # jit the sampler update per step index (the per-step coefficients
        # are host floats baked in as constants; eager elementwise updates
        # would each round-trip the device transport)
        sched_key = ("sched", sampler, num_inference_steps, float(shift),
                     solver_order)
        if sched_key not in self._jit_cache:
            self._jit_cache[sched_key] = jax.jit(
                sched.step, static_argnums=(1,))
        sched_step = self._jit_cache[sched_key]

        residual = None
        for i in range(num_inference_steps):
            t_i = float(sched.timesteps[i])
            step_cfg = do_cfg and (i < cfg_off_after)
            ctx_i = context
            if do_cfg and not step_cfg:
                ctx_i = context[context.shape[0] // 2:]  # cond half only
            res_in = None
            if skips[i]:
                res_in = residual
                need = latents.shape[0] * (2 if step_cfg else 1)
                if res_in.shape[0] != need:  # cfg-skip shrank the batch
                    res_in = res_in[-need:]  # keep cond rows (ref: [-B:])
            step = self._step_fn(step_cfg, guidance_scale, condition_count,
                                 skip_blocks=skips[i])
            v, res = step(self.dit_params, latents, t_i, ctx_i, cos, sin,
                          res_in)
            if not skips[i]:
                residual = res
            latents, state = sched_step(v, i, latents, state)
        _tick("denoise(stepwise)", latents)

        out = self._decode_outputs(latents, cot, condition_count,
                                   ground_latent_count)
        if output_latents:
            out.latents = np.asarray(latents)
        _tick("decode")
        return out

    def _decode_outputs(self, latents, cot: bool, condition_count: int,
                        ground_latent_count: int) -> WanPipelineOutput:
        """Segment-wise decode (`pipeline_wan.py:757-786`).

        ``VIDEOCOF_DECODE_FUSED=1`` opts into the one-program-per-segment
        scan decode (`wan_vae_streaming.make_fused_decode_fn`) with a single
        combined uint8 fetch. In ISOLATION that path wins (A/B on v5e:
        3.96 s vs 4.64 s for ground+edit at 480p), but through the axon
        remote worker it LOSES in the full pipeline (19.5 s vs 16.8 s
        e2e) — interleaving the DiT trajectory executable with the large
        fused-decode executables penalizes every dispatch, where the
        generator's small dec_init/dec_step programs do not. Default is
        therefore the per-chunk generator path; revisit the default on
        locally attached chips. (`VIDEOCOF_DECODE_OVERLAP=1` selects the
        overlapped-readback generator variant.)
        """
        import os as _os
        fused_ok = (_os.environ.get("VIDEOCOF_DECODE_FUSED", "0") == "1"
                    and _os.environ.get("VIDEOCOF_DECODE_OVERLAP") != "1"
                    # fused scan decode exists for the 2.1 VAE only
                    and hasattr(self._vae_mods()[1], "make_fused_decode_fn"))
        if fused_ok:
            return self._decode_outputs_fused(latents, cot, condition_count,
                                              ground_latent_count)
        single = (_os.environ.get("VIDEOCOF_DECODE_SINGLE_FETCH", "1") == "1"
                  and _os.environ.get("VIDEOCOF_DECODE_OVERLAP") != "1")
        g0, g1 = condition_count, condition_count + (ground_latent_count
                                                     if cot else 0)
        if single:
            # decode each segment to device uint8, concat ON DEVICE, pay ONE
            # host fetch for the whole output (each segment fetch has a
            # ~0.5 s transport floor on the axon tunnel)
            parts = []
            if g1 > g0:
                parts.append(self.decode_to_u8_device(latents[:, :, g0:g1]))
            parts.append(self.decode_to_u8_device(latents[:, :, g1:]))
            u8 = (parts[0] if len(parts) == 1
                  else jnp.concatenate(parts, axis=2))
            # I420 half-size fetch: pack RGB -> I420 on device and fetch
            # half the bytes (the same 4:2:0 chroma subsample any mp4 save
            # applies). AUTO-selected from the measured transport rate
            # (< ~20 MB/s: the axon tunnel on a bad day — see
            # utils/transport.py); VIDEOCOF_FETCH_YUV420=1/0 overrides.
            # Raw-frame consumers that need chroma exactness should pin 0.
            from ..utils import transport
            yuv = (transport.should_fetch_yuv420()
                   and u8.shape[3] % 4 == 0 and u8.shape[4] % 2 == 0)
            if yuv:
                if "rgb2i420" not in self._jit_cache:
                    self._jit_cache["rgb2i420"] = jax.jit(
                        colorspace.rgb_to_i420)
                packed = np.asarray(self._jit_cache["rgb2i420"](u8))
                host = colorspace.i420_to_rgb01(packed)
            else:
                host = np.asarray(u8).astype(np.float32) / 255.0
            if g1 > g0:
                tc = self.vae_cfg.temporal_compression_ratio
                gf = 1 + (g1 - g0 - 1) * tc
                return WanPipelineOutput(videos=host,
                                         ground_videos=host[:, :, :gf],
                                         edit_videos=host[:, :, gf:])
            return WanPipelineOutput(videos=host, edit_videos=host)
        dec = self.decode_to_numpy01
        if cot:
            ground_video = dec(latents[:, :, g0:g1]) if g1 > g0 else None
            edit_video = dec(latents[:, :, g1:])
            parts = [p for p in (ground_video, edit_video) if p is not None]
            videos = np.concatenate(parts, axis=2)
            return WanPipelineOutput(videos=videos, ground_videos=ground_video,
                                     edit_videos=edit_video)
        edit_video = dec(latents[:, :, condition_count:])
        return WanPipelineOutput(videos=edit_video, edit_videos=edit_video)

    def _decode_outputs_fused(self, latents, cot: bool, condition_count: int,
                              ground_latent_count: int) -> WanPipelineOutput:
        g0 = condition_count
        g1 = condition_count + (ground_latent_count if cot else 0)
        Tg = g1 - g0
        Te = latents.shape[2] - g1
        # One fused program PER SEGMENT (not one for both): keeps each
        # program's peak footprint at a single streaming step, which matters
        # when the DiT + trajectory executables are resident; the segments'
        # uint8 outputs concat on device so the host still pays ONE fetch.
        key = ("fused_dec", latents.shape, g0, g1, self.vae_decode_chunk)
        if key not in self._jit_cache:
            fn_e = wan_vae_streaming.make_fused_decode_fn(
                self.vae_cfg, Te, chunk_latent=self.vae_decode_chunk)
            fe = jax.jit(lambda p, lat: fn_e(p, lat[:, :, g1:].astype(
                self.dtype)))
            if Tg > 0:
                fn_g = wan_vae_streaming.make_fused_decode_fn(
                    self.vae_cfg, Tg, chunk_latent=self.vae_decode_chunk)
                fg = jax.jit(lambda p, lat: fn_g(p, lat[:, :, g0:g1].astype(
                    self.dtype)))
                cat = jax.jit(lambda g, e: jnp.concatenate([g, e], axis=2))
                self._jit_cache[key] = (
                    lambda p, lat: cat(fg(p, lat), fe(p, lat)))
            else:
                self._jit_cache[key] = fe
        u8 = self._jit_cache[key](self.vae_params, latents)
        host = np.asarray(u8)  # ONE uint8 fetch for the whole output
        video01 = host.astype(np.float32) / 255.0
        tc = self.vae_cfg.temporal_compression_ratio
        if Tg > 0:
            ground_frames = 1 + (Tg - 1) * tc
            ground_video = video01[:, :, :ground_frames]
            edit_video = video01[:, :, ground_frames:]
            return WanPipelineOutput(videos=video01,
                                     ground_videos=ground_video,
                                     edit_videos=edit_video)
        return WanPipelineOutput(videos=video01, edit_videos=video01)
