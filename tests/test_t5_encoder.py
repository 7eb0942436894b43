"""umT5 encoder tests, including a numeric oracle against HuggingFace's
UMT5EncoderModel (same architecture the Wan checkpoint was exported from)."""

import numpy as np
import jax.numpy as jnp
import pytest

from videocof_tpu.configs import T5_TINY
from videocof_tpu.models import t5_encoder
from videocof_tpu.models.weights import convert_t5_state_dict

CFG = T5_TINY


def test_bucket_properties():
    b = t5_encoder.relative_position_buckets(16, 16, CFG.num_buckets,
                                             max_dist=128)
    assert b.shape == (16, 16)
    assert b.max() < CFG.num_buckets and b.min() >= 0
    # zero distance -> bucket 0; positive (key after query) offset by half
    assert (np.diag(b) == 0).all()
    assert b[0, 1] >= CFG.num_buckets // 2  # rel > 0 branch
    assert b[1, 0] < CFG.num_buckets // 2


def test_mask_isolates_padding():
    import jax
    params = t5_encoder.init_t5_encoder(jax.random.PRNGKey(0), CFG)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, CFG.vocab, (1, 12)))
    mask = jnp.asarray((np.arange(12) < 8)[None].astype(np.int32))
    out1 = t5_encoder.t5_encode(params, CFG, ids, mask)
    # changing padded token ids must not affect unpadded outputs
    ids2 = ids.at[0, 10].set((ids[0, 10] + 1) % CFG.vocab)
    out2 = t5_encoder.t5_encode(params, CFG, ids2, mask)
    np.testing.assert_allclose(np.asarray(out1[:, :8]),
                               np.asarray(out2[:, :8]), atol=1e-5)


def test_against_hf_umt5():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import UMT5Config, UMT5EncoderModel

    hf_cfg = UMT5Config(
        vocab_size=CFG.vocab, d_model=CFG.dim, d_kv=CFG.head_dim,
        d_ff=CFG.dim_ffn, num_layers=CFG.num_layers,
        num_heads=CFG.num_heads,
        relative_attention_num_buckets=CFG.num_buckets,
        relative_attention_max_distance=CFG.rel_max_dist,
        dropout_rate=0.0, feed_forward_proj="gated-gelu", is_encoder_decoder=False,
    )
    torch.manual_seed(0)
    model = UMT5EncoderModel(hf_cfg).eval()

    # remap HF keys -> Wan checkpoint key layout, then run our converter
    hf = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd = {"token_embedding.weight": hf["shared.weight"],
          "norm.weight": hf["encoder.final_layer_norm.weight"]}
    for i in range(CFG.num_layers):
        src = f"encoder.block.{i}.layer."
        dst = f"blocks.{i}."
        sd[dst + "norm1.weight"] = hf[src + "0.layer_norm.weight"]
        for n in "qkvo":
            sd[dst + f"attn.{n}.weight"] = hf[src + f"0.SelfAttention.{n}.weight"]
        sd[dst + "pos_embedding.embedding.weight"] = hf[
            src + "0.SelfAttention.relative_attention_bias.weight"]
        sd[dst + "norm2.weight"] = hf[src + "1.layer_norm.weight"]
        sd[dst + "ffn.gate.0.weight"] = hf[src + "1.DenseReluDense.wi_0.weight"]
        sd[dst + "ffn.fc1.weight"] = hf[src + "1.DenseReluDense.wi_1.weight"]
        sd[dst + "ffn.fc2.weight"] = hf[src + "1.DenseReluDense.wo.weight"]
    params = convert_t5_state_dict(sd, CFG)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab, (2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask)
                     ).last_hidden_state.numpy()
    got = np.asarray(t5_encoder.t5_encode(
        params, CFG, jnp.asarray(ids), jnp.asarray(mask)))

    # compare only unpadded positions (HF zeroes padded grads differently)
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1, :7], want[1, :7], rtol=2e-4, atol=2e-4)
