"""Numerical parity of the T5 encoder vs transformers on a random tiny config."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from pcm_tpu.models.t5 import T5Config, T5Encoder, convert_t5_torch_state


def test_t5_parity_random_weights():
    hf_cfg = transformers.T5Config(
        vocab_size=1000,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_heads=4,
        feed_forward_proj="gated-gelu",
        dense_act_fn="gelu_new",
        is_gated_act=True,
    )
    torch.manual_seed(0)
    hf = transformers.T5EncoderModel(hf_cfg).eval()

    cfg = T5Config(vocab_size=1000, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4)
    params = convert_t5_torch_state(hf.state_dict(), cfg)
    model = T5Encoder(cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 999, size=(2, 77))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    out = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
