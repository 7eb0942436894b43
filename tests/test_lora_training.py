"""LoRA adapter training (the capability the reference never released)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import WAN_TINY
from videocof_tpu.models import wan_dit
from videocof_tpu.models.lora import (apply_lora_adapters,
                                      init_lora_adapters,
                                      lora_adapters_to_state_dict,
                                      merge_lora)

CFG = WAN_TINY


@pytest.fixture(scope="module")
def base():
    return wan_dit.init_wan_dit(jax.random.PRNGKey(0), CFG)


def test_adapters_identity_at_init(base):
    ad = init_lora_adapters(jax.random.PRNGKey(1), CFG, rank=4)
    full = apply_lora_adapters(base, ad)
    np.testing.assert_array_equal(
        np.asarray(full["blocks"]["self_attn"]["q"]["kernel"]),
        np.asarray(base["blocks"]["self_attn"]["q"]["kernel"]))


def _randomize_up(ad, key):
    ups = jax.tree.map(lambda x: x, ad)
    for mod in ups["blocks"].values():
        for entry in mod.values():
            key, k = jax.random.split(key)
            entry["up"] = 0.1 * jax.random.normal(k, entry["up"].shape)
    return ups


def test_adapter_apply_matches_merge_lora_export(base):
    """apply_lora_adapters == merging the kohya export through merge_lora
    (the trained adapters are byte-compatible with the inference path and
    with the reference's lora_utils)."""
    ad = _randomize_up(init_lora_adapters(jax.random.PRNGKey(2), CFG,
                                          rank=4), jax.random.PRNGKey(3))
    full = apply_lora_adapters(base, ad)
    sd = lora_adapters_to_state_dict(ad)
    assert any(k.endswith(".lora_down.weight") for k in sd)
    merged = merge_lora(base, CFG, sd)
    for mod, name in (("self_attn", "q"), ("cross_attn", "v"),
                      ("ffn", "fc1")):
        np.testing.assert_allclose(
            np.asarray(full["blocks"][mod][name]["kernel"]),
            np.asarray(merged["blocks"][mod][name]["kernel"]),
            atol=1e-5, rtol=1e-5)


def test_lora_train_step_updates_only_adapters(base):
    from videocof_tpu.parallel import make_mesh
    from videocof_tpu.training import make_lora_train_step

    mesh = make_mesh(data=2, seq=2)
    init_fn, step_fn = make_lora_train_step(mesh, CFG, rank=4)
    state = init_fn(jax.random.PRNGKey(4))

    f, h, w = 3, 2, 2
    pt, ph, pw = CFG.patch_size
    B = 2
    cos, sin = wan_dit.make_rope_for_geometry(CFG, (f, h, w), f_src=1,
                                              f_ground=1)
    batch = {
        "x0": jax.random.normal(jax.random.PRNGKey(5),
                                (B, CFG.in_dim, f * pt, h * ph, w * pw)),
        "context": jax.random.normal(jax.random.PRNGKey(6),
                                     (B, CFG.text_len, CFG.text_dim)),
        "rope_cos": jnp.asarray(cos), "rope_sin": jnp.asarray(sin),
        "timesteps": jnp.array([300, 700], jnp.int32),
    }
    ad0 = jax.tree.map(np.asarray, state.adapters["blocks"])
    state2, loss = step_fn(state, base, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    # up matrices moved away from zero; base untouched by construction
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        ad0, jax.tree.map(np.asarray, state2.adapters["blocks"]))
    assert max(jax.tree.leaves(moved)) > 0.0

    # two more steps run through the same executable
    state3, loss3 = step_fn(state2, base, batch, jax.random.PRNGKey(8))
    assert np.isfinite(float(loss3))


def test_trainer_lora_mode_and_export(tmp_path, base):
    """CoFTrainer(lora_rank=...) trains adapters and the kohya export loads
    back through merge_lora (CLI --lora_rank/--export_lora path)."""
    import json
    from safetensors.numpy import save_file
    from videocof_tpu.configs import T5_TINY, VAE_TINY
    from videocof_tpu.models import t5_encoder, wan_vae
    from videocof_tpu.data.tokenizer import WanTokenizer
    from videocof_tpu.training.trainer import CoFTrainer, TrainerConfig

    vcfg = VAE_TINY
    dcfg = CFG.replace(in_dim=vcfg.z_dim, out_dim=vcfg.z_dim,
                       text_dim=T5_TINY.dim)
    dit = wan_dit.init_wan_dit(jax.random.PRNGKey(0), dcfg)
    tcfg = TrainerConfig(height=16, width=16, source_frames=5,
                         target_frames=5, reasoning_frames=4, batch_size=1,
                         total_steps=2, mesh_data=1, mesh_seq=1,
                         log_every=1, save_every=0, lora_rank=4)
    trainer = CoFTrainer(
        dit, dcfg, wan_vae.init_wan_vae(jax.random.PRNGKey(1), vcfg), vcfg,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        WanTokenizer(vocab_size=T5_TINY.vocab), tcfg)

    rng = np.random.default_rng(0)

    def sample_iter():
        while True:
            yield {
                "pixel_src": rng.uniform(-1, 1, (3, 5, 16, 16)).astype(
                    np.float32),
                "pixel_ground": rng.uniform(-1, 1, (3, 4, 16, 16)).astype(
                    np.float32),
                "pixel_tgt": rng.uniform(-1, 1, (3, 5, 16, 16)).astype(
                    np.float32),
                "text": "remove the cube",
            }

    state = trainer.train(sample_iter())
    assert int(state.step) == 2

    sd = lora_adapters_to_state_dict(jax.device_get(state.adapters))
    path = str(tmp_path / "lora.safetensors")
    save_file(dict(sd), path)
    merged = merge_lora(dit, dcfg, path)
    assert not np.allclose(
        np.asarray(merged["blocks"]["self_attn"]["q"]["kernel"]),
        np.asarray(dit["blocks"]["self_attn"]["q"]["kernel"]))


def test_inscan_fusion_matches_full_tree(base):
    """wan_dit_forward(lora=...) (per-block fusion inside the scan — the
    memory-bounded training path) == forward over apply_lora_adapters'
    full fused tree, for bf16 AND fp8 base storage."""
    from videocof_tpu.utils.fp8 import quantize_params_fp8

    ad = init_lora_adapters(jax.random.PRNGKey(5), CFG, rank=4)
    # non-trivial up so the delta actually changes the forward
    ad["blocks"] = jax.tree.map(
        lambda l: l + 0.02 * jax.random.normal(
            jax.random.PRNGKey(6), l.shape, l.dtype), ad["blocks"])
    scale = ad["alpha"] / ad["rank"]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, CFG.in_dim, 5, 4, 6)),
                    jnp.float32)
    t = jnp.array([500.0])
    ctx = jnp.asarray(rng.standard_normal((1, CFG.text_len, CFG.text_dim)),
                      jnp.float32)
    cos, sin = wan_dit.make_rope_for_geometry(CFG, (5, 2, 3))
    args = (x, t, ctx, jnp.asarray(cos), jnp.asarray(sin))

    full = apply_lora_adapters(base, ad)
    want = np.asarray(wan_dit.wan_dit_forward(full, CFG, *args))
    got = np.asarray(wan_dit.wan_dit_forward(
        base, CFG, *args, lora=(ad["blocks"], scale)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # changed vs no-lora (the adapters are non-trivial)
    plain = np.asarray(wan_dit.wan_dit_forward(base, CFG, *args))
    assert np.abs(want - plain).max() > 1e-4

    # fp8 frozen base: in-scan fusion dequantizes per block — the
    # LoRA-over-fp8 configuration apply_lora_adapters refuses
    qbase = quantize_params_fp8(jax.tree.map(np.asarray, base))
    qbase = jax.tree.map(jnp.asarray, qbase)
    got_q = np.asarray(wan_dit.wan_dit_forward(
        qbase, CFG, *args, lora=(ad["blocks"], scale)))
    assert np.isfinite(got_q).all()
    # fp8 storage error dominates the diff; just pin it is in-family
    assert np.abs(got_q - want).mean() < 0.15 * (np.abs(want).mean() + 1e-6)
