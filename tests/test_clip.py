"""Numerical parity of our CLIP text encoder against transformers (torch CPU),
on a randomly initialized tiny config — validates architecture + converter
without needing checkpoint downloads."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from pcm_tpu.models.clip import CLIPTextConfig, CLIPTextModel, convert_clip_torch_state


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_clip_parity_random_weights(act):
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=77,
        hidden_act=act,
        projection_dim=48,
        # the real SD checkpoints carry the legacy eos_token_id=2 config, which
        # selects transformers' argmax pooling branch — the one our model mirrors
        eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, hidden_act=act, projection_dim=48,
    )
    params = convert_clip_torch_state(hf.state_dict(), cfg)
    model = CLIPTextModel(cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(1, 999, size=(2, 77))
    ids[:, 0] = 0
    ids[0, 10] = 999  # "eot" = max id at position 10
    ids[1, 76] = 999

    with torch.no_grad():
        out = hf(torch.from_numpy(ids), output_hidden_states=True)
    hidden, last, pooled = model.apply({"params": params}, jnp.asarray(ids))

    # penultimate hidden state (SDXL conditioning path)
    np.testing.assert_allclose(
        np.asarray(hidden[-2]), out.hidden_states[-2].numpy(), rtol=2e-4, atol=2e-5
    )
    # final-LN last hidden (SD1.5 conditioning path)
    np.testing.assert_allclose(
        np.asarray(last), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-5
    )
    # pooled+projected (SDXL/SD3 micro-conditioning)
    np.testing.assert_allclose(
        np.asarray(pooled), out.text_embeds.numpy(), rtol=2e-4, atol=2e-5
    )
