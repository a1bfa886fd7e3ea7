"""int8 MXU compute path (VERDICT round-1 item #7): activation-quantized
int8 x int8 -> int32 dot/conv for QTensor-stored frozen weights.

Forward must track the dequantized bf16 linear op within int8 rounding error;
backward is defined as the exact dequantized linear op (straight-through), so
gradients must match it exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcm_tpu.lora.layers import LoRADense, LoRASpec
from pcm_tpu.utils.quant import (
    int8_matmul,
    quantize,
    quantized_conv,
    quantized_dot,
)


def _rel(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


def test_quantized_dot_forward_close():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 33, 64), jnp.float32)
    w = jnp.asarray(rng.randn(64, 96), jnp.float32)
    qt = quantize(w)
    ref = x @ qt.astype(jnp.float32)  # the dequantized linear op
    out = quantized_dot(x, qt, jnp.float32)
    assert out.shape == ref.shape
    assert _rel(out, ref) < 2e-2  # int8 activation rounding


def test_quantized_dot_grad_exact_dequant():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 64), jnp.float32)
    w = jnp.asarray(rng.randn(64, 32), jnp.float32)
    qt = quantize(w, logical_dtype=jnp.float32)

    g = jax.grad(lambda x_: jnp.sum(jnp.sin(quantized_dot(x_, qt, jnp.float32))))(x)
    # straight-through backward: d/dx of x @ W_deq with the cotangent coming
    # from the int8 forward's output
    y_int8 = quantized_dot(x, qt, jnp.float32)
    cot = jnp.cos(y_int8)
    g_ref = cot @ qt.astype(jnp.float32).T
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("strides,padding", [((1, 1), "SAME"), ((2, 2), ((1, 1), (1, 1)))])
def test_quantized_conv_forward_and_grad(strides, padding):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 16, 32) * 0.1, jnp.float32)
    qt = quantize(w, logical_dtype=jnp.float32)

    def ref_conv(x_):
        return jax.lax.conv_general_dilated(
            x_, qt.astype(jnp.float32), window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    out = quantized_conv(x, qt, jnp.float32, strides, padding)
    ref = ref_conv(x)
    assert out.shape == ref.shape
    assert _rel(out, ref) < 3e-2

    g = jax.grad(lambda x_: jnp.sum(quantized_conv(x_, qt, jnp.float32, strides, padding)))(x)
    g_ref = jax.grad(lambda x_: jnp.sum(ref_conv(x_)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_int8_matmul_which_scopes_op_class(monkeypatch):
    """`which=` narrows the int8 path to dense or conv ops only (the bisect /
    per-class deploy knob); env fallback accepts the same values."""
    from pcm_tpu.utils.quant import int8_matmul_enabled

    monkeypatch.delenv("PCM_INT8_MATMUL", raising=False)
    assert not int8_matmul_enabled("dense") and not int8_matmul_enabled("conv")
    with int8_matmul(which="dense"):
        assert int8_matmul_enabled("dense") and not int8_matmul_enabled("conv")
    with int8_matmul(which="conv"):
        assert int8_matmul_enabled("conv") and not int8_matmul_enabled("dense")
    with int8_matmul(which="both"):
        assert int8_matmul_enabled("dense") and int8_matmul_enabled("conv")
    with int8_matmul(enable=False):
        monkeypatch.setenv("PCM_INT8_MATMUL", "conv")  # context beats env
        assert not int8_matmul_enabled("conv")
    monkeypatch.setenv("PCM_INT8_MATMUL", "dense")
    assert int8_matmul_enabled("dense") and not int8_matmul_enabled("conv")
    with pytest.raises(ValueError):
        with int8_matmul(which="bogus"):
            pass


def test_lora_dense_int8_context():
    """LoRADense with a QTensor base kernel: int8 context changes the compute
    path, not the math (within rounding); LoRA grads still flow."""
    import flax.linen as nn

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 64), jnp.float32)
    spec = LoRASpec(rank=4, targets=("layer",))

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x_):
            return LoRADense(32, lora=spec, name="layer")(x_)

    model = Wrap()
    variables = model.init(jax.random.PRNGKey(0), x)
    qparams = {"layer": {
        "kernel": quantize(variables["params"]["layer"]["kernel"],
                           logical_dtype=jnp.float32),
        "bias": variables["params"]["layer"]["bias"],
    }}
    lora_tree = variables["lora"]
    # make B nonzero so the lora branch contributes
    lora_tree = jax.tree.map(lambda v: v + 0.01, lora_tree)

    y_deq = model.apply({"params": qparams, "lora": lora_tree}, x)
    with int8_matmul():
        y_int8 = model.apply({"params": qparams, "lora": lora_tree}, x)

        def loss(lt):
            return jnp.sum(model.apply({"params": qparams, "lora": lt}, x) ** 2)

        grads = jax.grad(loss)(lora_tree)
    assert _rel(y_int8, y_deq) < 2e-2
    assert max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)) > 0
