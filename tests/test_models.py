"""Model shape/semantics tests: encoder/decoder geometry, recon vs predict
modes, cluster gradient gating, alternative backbones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vadcl_tpu.core.config import ClusterConfig, ModelConfig
from vadcl_tpu.models import (
    ConvAE,
    ConvAEPredict,
    SwinDecoder3D,
    SwinEncoder3D,
    UNet3D,
    VADModel,
)

TINY = ModelConfig(
    embed_dim=32,
    encoder_depths=(1, 1),
    encoder_heads=(2, 4),
    decoder_depths=(1, 1),
    decoder_heads=(4, 2),
    cluster=ClusterConfig(feature_clusters=16, space_clusters=8, space_size=7),
)

def _clip(B=2, D=4, H=56, W=56):
    return jnp.asarray(
        np.random.RandomState(0).rand(B, D, H, W, 3), jnp.float32
    )


def test_encoder_geometry():
    enc = SwinEncoder3D(
        embed_dim=32, depths=(1, 1), num_heads=(2, 4), window_size=(8, 7, 7)
    )
    x = _clip()
    params = jax.jit(enc.init)(jax.random.key(0), x)
    latent, x_rec, taps = jax.jit(enc.apply)(params, x)
    # patchify (2,4,4): D 4->2, 56->14... with H=W=56: 56/4=14, downsample -> 7
    assert x_rec.shape == (2, 2, 14, 14, 32)
    assert latent.shape == (2, 2, 7, 7, 64)
    assert len(taps) == 2


@pytest.mark.parametrize("predict", [False, True])
def test_decoder_geometry(predict):
    dec = SwinDecoder3D(
        in_chans=64, depths=(1, 1), num_heads=(4, 2), predict=predict
    )
    x = jnp.zeros((2, 2, 7, 7, 64))
    params = jax.jit(dec.init)(jax.random.key(0), x)
    out = jax.jit(dec.apply)(params, x)
    d_out = 1 if predict else 4
    assert out.shape == (2, d_out, 56, 56, 3)


@pytest.mark.parametrize("predict", [False, True])
def test_vadmodel_forward(predict):
    cfg = TINY.replace(predict=predict) if hasattr(TINY, "replace") else None
    import dataclasses

    cfg = dataclasses.replace(TINY, predict=predict)
    model = VADModel(config=cfg)
    x = _clip()
    params = jax.jit(model.init)(jax.random.key(0), x)
    out = jax.jit(model.apply)(params, x)
    d_out = 1 if predict else 4
    assert out.recon.shape == (2, d_out, 56, 56, 3)
    assert np.isfinite(float(out.cluster_loss))
    assert np.isfinite(float(out.space_loss))
    assert out.feature.shape == (2 * 2 * 7 * 7, 64)
    assert out.feature_label.shape == (2 * 2 * 7 * 7,)
    assert bool(jnp.isfinite(out.recon).all())


def test_vadmodel_no_cluster():
    import dataclasses

    cfg = dataclasses.replace(TINY, use_cluster=False)
    model = VADModel(config=cfg)
    x = _clip()
    params = jax.jit(model.init)(jax.random.key(0), x)
    out = jax.jit(model.apply)(params, x)
    assert float(out.cluster_loss) == 0.0
    assert out.cluster_assign is None


def test_cluster_detach_gating():
    """Non-compactness mode must stop encoder gradients from the cluster loss
    (model/backbone.py:86-88); compactness mode must pass them."""
    import dataclasses

    x = _clip(B=1)

    def cluster_grad_norm(compactness):
        cfg = dataclasses.replace(TINY, compactness=compactness)
        model = VADModel(config=cfg)
        params = jax.jit(model.init)(jax.random.key(0), x)

        def loss_fn(p):
            out = model.apply(p, x)
            return out.cluster_loss + out.space_loss

        g = jax.jit(jax.grad(loss_fn))(params)
        enc = g["params"]["encoder"]
        total = sum(
            float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree_util.tree_leaves(enc)
        )
        return total

    assert cluster_grad_norm(False) == 0.0
    assert cluster_grad_norm(True) > 0.0


def test_compactness_decodes_cluster_recon():
    """In compactness mode the decoder input is assign @ centers, so center
    grads must receive decoder/recon gradients too (model/backbone.py:89)."""
    import dataclasses

    x = _clip(B=1)
    cfg = dataclasses.replace(TINY, compactness=True)
    model = VADModel(config=cfg)
    params = jax.jit(model.init)(jax.random.key(0), x)

    def recon_loss(p):
        out = model.apply(p, x)
        return jnp.sum(out.recon.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(recon_loss))(params)
    center_grad = g["params"]["cluster1"]["cluster_center"]
    assert float(jnp.sum(jnp.abs(center_grad))) > 0.0


def test_unet3d_shapes():
    net = UNet3D(feat_channels=(8, 16, 32, 64, 128))
    x = _clip(B=1, D=2, H=32, W=32)
    params = jax.jit(net.init)(jax.random.key(0), x)
    out = jax.jit(net.apply)(params, x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid head


def test_convae_shapes():
    net = ConvAE(t_length=2)
    x = _clip(B=1, D=2, H=32, W=32)
    vars_ = jax.jit(net.init)(jax.random.key(0), x)
    out, mutated = jax.jit(lambda v, a: net.apply(v, a, train=True, mutable=["memory"]))(vars_, x)
    assert out.recon.shape == (1, 2, 32, 32, 3)
    assert mutated["memory"]["memory"]["keys"].shape == (10, 512)
    # memory bank rows stay unit-norm after update
    norms = jnp.linalg.norm(mutated["memory"]["memory"]["keys"], axis=1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-5)


def test_convae_predict_shapes():
    net = ConvAEPredict(t_length=5)
    x = _clip(B=1, D=4, H=32, W=32)
    vars_ = jax.jit(net.init)(jax.random.key(0), x)
    out, _ = jax.jit(lambda v, a: net.apply(v, a, train=False, mutable=["memory"]))(vars_, x)
    assert out.recon.shape == (1, 1, 32, 32, 3)


def test_subpixel_deconv_flag_is_param_neutral_and_equal():
    """ModelConfig.subpixel_deconv reroutes the decoder deconvs through the
    pixel-shuffle decomposition: identical variable tree, equal recon in
    both predict (D=1 head) and reconstruction (D=4) modes."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vadcl_tpu.core.config import preset
    from vadcl_tpu.models.backbone import VADModel

    base = preset("shanghaitech").model
    small = dataclasses.replace(
        base,
        predict=True,
        cluster=dataclasses.replace(
            base.cluster, space_size=7, feature_clusters=16, space_clusters=8
        ),
    )
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 56, 56, 3), jnp.float32)
    for predict in (True, False):
        cfg0 = dataclasses.replace(small, predict=predict)
        cfg1 = dataclasses.replace(cfg0, subpixel_deconv=True)
        m0 = VADModel(config=cfg0, dtype=jnp.float32)
        m1 = VADModel(config=cfg1, dtype=jnp.float32)
        v = jax.jit(m0.init)(jax.random.key(0), x)
        # same variables load into both graphs (param-tree neutrality)
        r0 = np.asarray(m0.apply(v, x).recon)
        r1 = np.asarray(m1.apply(v, x).recon)
        np.testing.assert_allclose(r0, r1, rtol=1e-5, atol=1e-5)
