"""Fused cluster-assign kernel vs the XLA path (interpret mode), including
gradients through the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np

from vadcl_tpu.ops.cluster import cdist, feature_cluster_assign, neg_soft_assign
from vadcl_tpu.ops.pallas_cluster import fused_cluster_assign


def _setup(n=256, c=32, k=24, seed=0):
    rng = np.random.RandomState(seed)
    tokens = jnp.asarray(rng.randn(n, c), jnp.float32)
    centers = jnp.asarray(rng.rand(k, c), jnp.float32)
    return tokens, centers


def test_fused_cluster_matches_xla():
    tokens, centers = _setup()
    out = fused_cluster_assign(tokens, centers, 16.0, True)
    ref = feature_cluster_assign(
        tokens.reshape(1, 1, 16, 16, 32), centers, 16.0
    )
    np.testing.assert_array_equal(np.asarray(out.labels), np.asarray(ref.labels))
    np.testing.assert_allclose(
        np.asarray(out.recon), np.asarray(ref.recon).reshape(256, 32),
        rtol=1e-5, atol=1e-5,
    )
    want_loss_sq = float(jnp.sum((ref.distance * ref.assign) ** 2))
    np.testing.assert_allclose(float(out.loss_sq_sum), want_loss_sq, rtol=1e-5)


def test_fused_cluster_gradients():
    tokens, centers = _setup(n=128, c=16, k=12, seed=1)
    cot = jnp.asarray(np.random.RandomState(2).randn(128, 16), jnp.float32)

    def loss_fused(t, c):
        o = fused_cluster_assign(t, c, 8.0, True)
        return jnp.sum(o.recon * cot) + jnp.sqrt(o.loss_sq_sum)

    def loss_xla(t, c):
        d = cdist(t, c)
        a = neg_soft_assign(d, 8.0)
        recon = a @ c
        return jnp.sum(recon * cot) + jnp.sqrt(jnp.sum((d * a) ** 2))

    g1 = jax.grad(loss_fused, argnums=(0, 1))(tokens, centers)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(tokens, centers)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_cluster_in_model():
    import dataclasses

    from vadcl_tpu.core.config import ClusterConfig, ModelConfig
    from vadcl_tpu.models.backbone import VADModel

    cfg = ModelConfig(
        embed_dim=32, encoder_depths=(1, 1), encoder_heads=(2, 4),
        decoder_depths=(1, 1), decoder_heads=(4, 2), fused_cluster=True,
        cluster=ClusterConfig(feature_clusters=16, space_clusters=8, space_size=7),
    )
    # interpret-mode is needed on CPU: route through the kernel's interpret
    # path by monkeypatching the default (tests run on CPU)
    import vadcl_tpu.ops.pallas_cluster as pc

    orig = pc._forward_pallas
    orig_sp = pc._space_forward_pallas
    pc._forward_pallas = lambda t, c, a, i: orig(t, c, a, True)
    pc._space_forward_pallas = lambda m, c, a, i: orig_sp(m, c, a, True)
    try:
        model = VADModel(config=cfg)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 56, 56, 3), jnp.float32)
        v = jax.jit(model.init)(jax.random.key(0), x)
        out = jax.jit(model.apply)(v, x)
        assert np.isfinite(float(out.cluster_loss))
        assert out.cluster_assign is None  # not materialized on the fused path

        cfg2 = dataclasses.replace(cfg, fused_cluster=False)
        out2 = jax.jit(VADModel(config=cfg2).apply)(v, x)
        np.testing.assert_allclose(
            float(out.cluster_loss), float(out2.cluster_loss), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.recon), np.asarray(out2.recon), rtol=1e-4, atol=1e-5
        )
    finally:
        pc._forward_pallas = orig
        pc._space_forward_pallas = orig_sp


def test_fused_space_cluster_matches_xla():
    from vadcl_tpu.ops.cluster import space_cluster_assign
    from vadcl_tpu.ops.pallas_cluster import fused_space_cluster_loss

    rng = np.random.RandomState(3)
    B, D, H, W, C, K = 2, 2, 7, 7, 8, 6
    x = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)
    centers = jnp.asarray(rng.rand(C, K, H * W), jnp.float32)
    maps = x.transpose(4, 0, 1, 2, 3).reshape(C, B * D, H * W)
    got = float(fused_space_cluster_loss(maps, centers, 32.0, True))
    ref = space_cluster_assign(x, centers, 32.0)
    want = float(jnp.sum((ref.distance * ref.assign) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # gradients through the custom VJP
    g1 = jax.grad(
        lambda m, c: jnp.sqrt(fused_space_cluster_loss(m, c, 32.0, True)),
        argnums=(0, 1),
    )(maps, centers)
    from vadcl_tpu.ops.cluster import cdist, neg_soft_assign

    def xla_loss(m, c):
        d = cdist(m, c)
        a = neg_soft_assign(d, 32.0)
        return jnp.sqrt(jnp.sum((d * a) ** 2))

    g2 = jax.grad(xla_loss, argnums=(0, 1))(maps, centers)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
