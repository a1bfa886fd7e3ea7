"""Pallas kernels vs XLA oracles.

Every kernel test passes ``interpret=True`` so the ACTUAL Pallas kernel body
runs (via the interpreter) on the CPU CI box — without it the public entry
points dispatch to the XLA oracle on non-TPU backends and the tests would
compare the oracle against itself."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcm_tpu.ops import (
    attention_reference,
    flash_attention,
    geglu,
    geglu_reference,
    group_norm_silu,
    group_norm_silu_reference,
)


@pytest.mark.parametrize(
    "b,sq,sk,h,d",
    [
        (2, 64, 64, 2, 40),     # SD1.5-ish self-attn head_dim
        (1, 128, 77, 4, 64),    # cross-attn with CLIP context
        (2, 77, 77, 4, 64),     # text-encoder self-attn
        (1, 260, 260, 2, 128),  # non-multiple seq
    ],
)
def test_flash_attention_forward(b, sq, sk, h, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, sq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, h, d), jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_attention_bf16():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 64, 2, 64), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 64, 2, 64), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 64, 2, 64), jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True)
    ref = attention_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-2, atol=5e-2
    )


def test_flash_attention_grad():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 40, 2, 32), jnp.float32)
    k = jnp.asarray(rng.randn(1, 56, 2, 32), jnp.float32)
    v = jnp.asarray(rng.randn(1, 56, 2, 32), jnp.float32)

    def f(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, interpret=True)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.sin(attention_reference(q, k, v)))

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3, err_msg=f"d{name}"
        )


@pytest.mark.parametrize(
    "shape,groups",
    [((2, 8, 8, 64), 32), ((1, 17, 96), 32), ((2, 5, 7, 320), 32)],
)
def test_group_norm_silu(shape, groups):
    rng = np.random.RandomState(3)
    c = shape[-1]
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    gamma = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(c), jnp.float32)
    out = group_norm_silu(x, gamma, beta, groups, interpret=True)
    ref = group_norm_silu_reference(x, gamma, beta, groups)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_group_norm_silu_no_act_and_grad():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 6, 64), jnp.float32)
    gamma = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(64), jnp.float32)
    out = group_norm_silu(x, gamma, beta, 16, act=None, interpret=True)
    ref = group_norm_silu_reference(x, gamma, beta, 16, act=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def f(x, gamma, beta):
        return jnp.sum(group_norm_silu(x, gamma, beta, 16, interpret=True) ** 2)

    def f_ref(x, gamma, beta):
        return jnp.sum(group_norm_silu_reference(x, gamma, beta, 16) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(x, gamma, beta)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


# (32, 128, 128)/(16, 256, 384) take the in-place BlockSpec kernel path;
# (17, 96, 200) is lane-unaligned and must hit the XLA-oracle fallback
@pytest.mark.parametrize("m,k,f", [(32, 128, 128), (16, 256, 384), (17, 96, 200)])
def test_geglu(m, k, f):
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, m, k), jnp.float32)
    w = jnp.asarray(rng.randn(k, 2 * f) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(2 * f) * 0.1, jnp.float32)
    out = geglu(x, w, b, interpret=True)
    ref = geglu_reference(x, w, b)
    assert out.shape == (2, m, f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def loss(x, w, b):
        return jnp.sum(geglu(x, w, b, interpret=True) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(geglu_reference(x, w, b) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3)


def test_groupnorm_size_dispatch():
    """Huge activations must take the streaming Pallas kernel even when the
    inference-trace default prefers XLA (the XLA path materializes whole-
    tensor f32 temps — 4 GiB at VAE-decoder scale, OOM on a 16G chip)."""
    from pcm_tpu.ops.groupnorm import _force_pallas_for_size

    assert not _force_pallas_for_size((1, 128, 128, 1280))  # UNet scale: XLA ok
    assert not _force_pallas_for_size((4, 77, 2048))
    assert _force_pallas_for_size((1, 1024, 1024, 256))  # VAE decode: 1 GiB f32
    assert _force_pallas_for_size((4, 512, 512, 512))


def test_resolve_remat_policy_parametrized_cap():
    """"dots<N>m" parses to a save-dots-below-N-MiB policy; a dot output at
    exactly the cap is saved, one above is recomputed."""
    import jax.core
    from jax import lax

    from pcm_tpu.ops.common import resolve_remat_policy

    pol = resolve_remat_policy("dots8m")
    dn = (((1,), (0,)), ((), ()))

    def decide(m, k, n):
        avals = (
            jax.core.ShapedArray((m, k), jnp.bfloat16),
            jax.core.ShapedArray((k, n), jnp.bfloat16),
        )
        return pol(lax.dot_general_p, *avals, dimension_numbers=dn,
                   precision=None, preferred_element_type=jnp.bfloat16,
                   out_sharding=None)

    assert decide(2048, 64, 2048)  # 8 MiB bf16 output: saved
    assert not decide(4096, 64, 2048)  # 16 MiB: recomputed
    assert resolve_remat_policy(None) is None
    with pytest.raises(KeyError):
        resolve_remat_policy("dots_bogus")


def test_remat_fa_policy_saves_flash_residuals():
    """"dots<N>m+fa" must (a) keep grads identical to no checkpointing and
    (b) actually save the checkpoint-named flash out/lse residuals, so the
    backward's recompute pass DCEs the O(S^2) forward kernel
    (ops/flash_attention.py:_flash_fwd_rule, ops/common.py)."""
    import jax

    try:
        from jax.ad_checkpoint import saved_residuals
    except ImportError:  # private in jax 0.9 — diagnostics-only helper
        from jax._src.ad_checkpoint import saved_residuals

    from pcm_tpu.ops import flash_attention
    from pcm_tpu.ops.common import resolve_remat_policy

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 128, 2, 64), jnp.float32)
    k = jnp.asarray(rng.randn(1, 128, 2, 64), jnp.float32)
    v = jnp.asarray(rng.randn(1, 128, 2, 64), jnp.float32)
    w = jnp.asarray(rng.randn(64, 64) * 0.1, jnp.float32)

    def f(w, q):
        # a dot before/after the attention so the checkpoint has real
        # recompute work around the named values
        o = flash_attention(q @ w, k, v, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    base = jax.grad(f)(w, q)
    ck = jax.checkpoint(f, policy=resolve_remat_policy("dots8m+fa"))
    got = jax.grad(ck)(w, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-6)
    def fa_saved(policy_name):
        ckp = jax.checkpoint(f, policy=resolve_remat_policy(policy_name))
        res = saved_residuals(ckp, w, q)
        # the named fa_out surfaces under its bf16-cast label on some jax
        # versions, so match by source line + internal (b,h,s,d) shape; lse by
        # its name
        out_saved = any(
            "flash_attention.py" in (n or "") and tuple(a.shape) == (1, 2, 128, 64)
            for a, n in res
        )
        lse_saved = any("fa_lse" in (n or "") for a, n in res)
        return out_saved, lse_saved

    assert fa_saved("dots8m+fa") == (True, True)
    # ...and the base policy alone must NOT be what saves them
    assert fa_saved("dots8m") == (False, False)
