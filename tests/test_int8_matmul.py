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
    # the spatial-conv modes are bisect-only (30x full-graph pathology,
    # docs/PERF.md) and warn loudly when entered
    with pytest.warns(UserWarning, match="SPATIAL convs"):
        with int8_matmul(which="conv"):
            assert int8_matmul_enabled("conv") and not int8_matmul_enabled("dense")
    with pytest.warns(UserWarning, match="SPATIAL convs"):
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


# ---------------------------------------------------------------------------
# Fused Pallas path (ops/int8_matmul.py): in-VMEM activation quantization
# ---------------------------------------------------------------------------


def test_fused_quantized_dot_matches_exact():
    from pcm_tpu.ops.int8_matmul import fused_quantized_dot
    from pcm_tpu.utils.quant import quantize

    rng = np.random.default_rng(0)
    # multi-K-tile (1024/512=2 tiles), padded M (300 -> 512-block), odd N tile
    for (m, k, n) in [(300, 1024, 640), (64, 256, 128), (1, 128, 128)]:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)) * 0.05, jnp.float32)
        qt = quantize(w)
        exact = x.astype(jnp.float32) @ w
        fused = fused_quantized_dot(
            x, qt.values, qt.scale, out_dtype=jnp.bfloat16
        ).astype(jnp.float32)
        rel = float(jnp.linalg.norm(fused - exact) / jnp.linalg.norm(exact))
        assert rel < 0.02, (m, k, n, rel)  # int8 quantization noise only


def test_fused_tile_scales_no_worse_than_row_scales():
    """Per-(row, K-tile) quantization is finer-grained than _qdot's whole-row
    scales: on activations with outlier columns the fused path's error must
    not exceed the XLA path's (and is typically lower)."""
    from pcm_tpu.ops.int8_matmul import fused_quantized_dot
    from pcm_tpu.utils.quant import quantize, quantized_dot

    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 1024)).astype(np.float32)
    x[:, :512] *= 50.0  # outlier half dominates a whole-row amax
    x = jnp.asarray(x, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(1024, 256)) * 0.05, jnp.float32)
    qt = quantize(w)
    exact = x.astype(jnp.float32) @ w
    fused = fused_quantized_dot(x, qt.values, qt.scale,
                                out_dtype=jnp.float32, block_k=512)
    xla = quantized_dot(x, qt, jnp.float32)
    err_f = float(jnp.linalg.norm(fused - exact))
    err_x = float(jnp.linalg.norm(xla - exact))
    assert err_f <= err_x * 1.01, (err_f, err_x)


def test_fused_dispatch_and_grad():
    """which="fused" routes dense QTensor matmuls through the Pallas kernel
    (convs stay dequant-bf16) and backward is the exact dequantized linear."""
    from pcm_tpu.utils.quant import (
        int8_fused_enabled,
        int8_matmul,
        int8_matmul_enabled,
        quantize,
        quantized_dot,
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 50, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    qt = quantize(w)
    with int8_matmul(which="fused"):
        assert int8_fused_enabled()
        assert int8_matmul_enabled("dense")
        assert not int8_matmul_enabled("conv")
        y = quantized_dot(x, qt, jnp.float32)
        g = jax.grad(lambda xx: quantized_dot(xx, qt, jnp.float32).sum())(x)
    assert not int8_fused_enabled()
    assert y.shape == (2, 50, 128)
    wdq = (qt.values.astype(jnp.float32) * qt.scale).astype(jnp.float32)
    g_exact = jax.grad(lambda xx: (xx @ wdq).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_exact),
                               rtol=1e-5, atol=1e-5)


def test_fused_pointwise_conv_routes_to_dense_kernel():
    """which="fused": a 1x1 stride-1 QTensor conv lowers to the fused Pallas
    dot (per-pixel matmul identity), spatial convs fall back to the exact
    dequant-bf16 conv, and backward through the 1x1 path is the exact
    dequantized linear op."""
    from pcm_tpu.lora.layers import _base_conv
    from pcm_tpu.utils.quant import int8_matmul, quantize

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 256)), jnp.float32)

    # -- pointwise: int8-quant tolerance vs the exact matmul
    w1 = jnp.asarray(rng.normal(size=(1, 1, 256, 128)) * 0.05, jnp.float32)
    qt1 = quantize(w1)
    exact = jnp.einsum("nhwi,io->nhwo", x, w1.reshape(256, 128))
    with int8_matmul(which="fused"):
        y = _base_conv(x, qt1, jnp.float32, (1, 1), "SAME")
        g = jax.grad(lambda xx: _base_conv(
            xx, qt1, jnp.float32, (1, 1), "SAME").sum())(x)
    assert y.shape == exact.shape
    assert _rel(y, exact) < 0.02
    w1dq = (qt1.values.astype(jnp.float32) * qt1.scale).reshape(256, 128)
    g_exact = jax.grad(
        lambda xx: jnp.einsum("nhwi,io->nhwo", xx, w1dq).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_exact),
                               rtol=1e-5, atol=1e-5)

    # -- strided 1x1 and spatial 3x3 stay on the dequant conv (bit-exact)
    import jax.lax as lax

    for wshape, strides in [((1, 1, 256, 128), (2, 2)), ((3, 3, 256, 128), (1, 1))]:
        w = jnp.asarray(rng.normal(size=wshape) * 0.05, jnp.float32)
        qt = quantize(w)
        ref = lax.conv_general_dilated(
            x, qt.astype(jnp.float32), window_strides=strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        with int8_matmul(which="fused"):
            out = _base_conv(x, qt, jnp.float32, strides, "SAME")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
