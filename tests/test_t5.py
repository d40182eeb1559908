"""T5 encoder golden test vs HF torch T5EncoderModel (random tiny weights)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from landiff_tpu.config import T5Config
from landiff_tpu.models import t5 as T5

CFG = T5Config(model_name="", d_model=32, d_ff=64, num_layers=2, num_heads=4,
               d_kv=8, vocab_size=100, max_length=16)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=CFG.vocab_size, d_model=CFG.d_model, d_kv=CFG.d_kv,
        d_ff=CFG.d_ff, num_layers=CFG.num_layers, num_heads=CFG.num_heads,
        relative_attention_num_buckets=CFG.relative_attention_num_buckets,
        relative_attention_max_distance=CFG.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", dense_act_fn="gelu_new",
        is_gated_act=True, dropout_rate=0.0)
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    return model


def test_t5_matches_hf(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = T5.params_from_hf_state_dict(sd, CFG)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 10))
    mask = np.ones((2, 10), bool)
    mask[1, 7:] = False  # padded row

    with torch.no_grad():
        want = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    got = np.asarray(T5.encode(params, jnp.asarray(ids), jnp.asarray(mask),
                               CFG, compute_dtype=jnp.float32))
    # padded positions may differ (HF computes garbage there); compare valid
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1, :7], want[1, :7], rtol=2e-4, atol=2e-4)


def test_t5_bf16_runs():
    import jax

    params = T5.init(jax.random.PRNGKey(0), CFG)
    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), bool)
    out = T5.encode(params, ids, mask, CFG, compute_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (1, 8, CFG.d_model)
    assert not np.isnan(np.asarray(out, np.float32)).any()
