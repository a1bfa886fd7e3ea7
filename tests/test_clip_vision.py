"""Numerical parity of our CLIP vision tower against transformers (torch CPU)
on a randomly initialized tiny config — same recipe as tests/test_clip.py.
The tower backs the safety checker and CLIP-FID (VERDICT round-1 items #3/#4).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from pcm_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionModel,
    convert_clip_vision_torch_state,
    preprocess_images,
)


def test_clip_vision_parity_random_weights():
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, projection_dim=48,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, projection_dim=48,
    )
    params = convert_clip_vision_torch_state(hf.state_dict(), cfg)
    model = CLIPVisionModel(cfg)

    rng = np.random.RandomState(0)
    pix = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        out = hf(torch.from_numpy(pix.transpose(0, 3, 1, 2)), output_hidden_states=True)
    last, pooled = model.apply({"params": params}, jnp.asarray(pix))

    np.testing.assert_allclose(
        np.asarray(last), out.hidden_states[-1].numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.image_embeds.numpy(), rtol=2e-4, atol=3e-5
    )


def test_preprocess_images():
    imgs = np.zeros((2, 64, 64, 3), np.float32)  # mid-gray in [-1,1] space
    out = preprocess_images(imgs, size=32)
    assert out.shape == (2, 32, 32, 3)
    # 0.5 in [0,1] space, CLIP-normalized
    from pcm_tpu.models.clip_vision import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    expect = (0.5 - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)
