"""Coverage of the smaller reference-inventory items: legacy v1 decoder,
2D->3D weight inflation, cluster-alpha schedule, L1 recon loss, LARS."""

import jax
import jax.numpy as jnp
import numpy as np

from vadcl_tpu.models import LegacySwinDecoder
from vadcl_tpu.ops.cluster import cluster_alpha_schedule, l1_recon_loss
from vadcl_tpu.train.optim import build_optimizer
from vadcl_tpu.train.torch_import import inflate_swin2d


def test_legacy_decoder_shapes():
    dec = LegacySwinDecoder(in_chans=64, patch_size=(2, 4, 4))
    x = jnp.zeros((1, 2, 7, 7, 64))
    taps = [jnp.zeros((1, 2, 14, 14, 32)), jnp.zeros((1, 2, 7, 7, 64)),
            jnp.zeros((1, 2, 7, 7, 64))]
    # reverse()[1:] -> first used tap is taps[-2]; matches x spatially here
    v = jax.jit(dec.init)(jax.random.key(0), x, taps)
    out = jax.jit(dec.apply)(v, x, taps)
    # up (1,2,2) then debed (2,4,4): 7 -> 14 -> 56; D: 2 -> 4
    assert out.shape == (1, 4, 56, 56, 3)


def test_cluster_alpha_schedule_matches_reference_recurrence():
    a = cluster_alpha_schedule(10)
    assert a[0] == 0.1
    for i in range(1, 10):
        np.testing.assert_allclose(
            a[i], (2 ** (1 / (np.log(i + 1)) ** 2)) * a[i - 1]
        )


def test_l1_recon_loss_pads_time():
    import torch

    r = np.random.RandomState(0).rand(2, 3, 8, 8, 3).astype(np.float32)
    t = np.random.RandomState(1).rand(2, 3, 8, 8, 3).astype(np.float32)
    got = float(l1_recon_loss(jnp.asarray(r), jnp.asarray(t), patch_t=2))
    # reference pads T 3->4 with zeros on both tensors then L1-means
    rp = np.concatenate([r, np.zeros((2, 1, 8, 8, 3), np.float32)], 1)
    tp = np.concatenate([t, np.zeros((2, 1, 8, 8, 3), np.float32)], 1)
    want = float(np.abs(rp - tp).mean())
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_inflate_swin2d():
    rng = np.random.RandomState(0)
    nH = 6
    state2d = {
        "patch_embed.proj.weight": rng.randn(96, 3, 4, 4).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(96).astype(np.float32),
        "layers.0.blocks.0.attn.relative_position_bias_table":
            rng.randn(13 * 13, nH).astype(np.float32),
        "layers.0.blocks.0.attn.qkv.weight": rng.randn(288, 96).astype(np.float32),
        "layers.0.blocks.0.norm1.weight": rng.randn(96).astype(np.float32),
        "layers.0.blocks.0.attn.relative_position_index": np.zeros((49, 49)),
    }
    out = inflate_swin2d(state2d, window_size=(8, 7, 7), patch_size=(2, 4, 4))
    # temporal repeat + /kd
    k = out["encoder/patch_embed/kernel"]
    assert k.shape == (2, 4, 4, 3, 96)
    np.testing.assert_allclose(k[0], k[1])
    np.testing.assert_allclose(
        k[0, :, :, 0, 0] * 2, state2d["patch_embed.proj.weight"][0, 0], rtol=1e-6
    )
    # bias table tiled (2*8-1) times over the temporal axis
    tbl = out["encoder/stage0/block0/attn/relative_position_bias_table"]
    assert tbl.shape == (15 * 169, nH)
    np.testing.assert_allclose(tbl[:169], tbl[169:338])
    assert out["encoder/stage0/block0/attn/qkv_kernel"].shape == (96, 288)
    assert "relative_position_index" not in str(sorted(out))


def test_inflate_swin2d_upstream_4stage():
    """The UNMODIFIED upstream Video-Swin checkpoint layout (4 stages with
    PatchMerging + classifier head, ``mmaction/models/backbones/
    swin_transformer.py:17-669``) loads partially: stage 0/1 block weights
    translate, everything without a counterpart is skipped with a log —
    the reference's tolerant partial-load (``misc/utils.py:51-76``)."""
    rng = np.random.RandomState(2)
    state2d = {
        "patch_embed.proj.weight": rng.randn(96, 3, 4, 4).astype(np.float32),
        "patch_embed.norm.weight": rng.randn(96).astype(np.float32),
        "layers.0.blocks.0.attn.qkv.weight":
            rng.randn(288, 96).astype(np.float32),
        "layers.0.downsample.reduction.weight":
            rng.randn(192, 384).astype(np.float32),  # PatchMerging
        "layers.0.downsample.norm.weight":
            rng.randn(384).astype(np.float32),
        "layers.1.blocks.0.mlp.fc1.weight":
            rng.randn(768, 192).astype(np.float32),
        "layers.2.blocks.0.attn.qkv.weight":
            rng.randn(1152, 384).astype(np.float32),  # stage >= num_stages
        "layers.3.blocks.0.attn.qkv.weight":
            rng.randn(2304, 768).astype(np.float32),
        "norm.weight": rng.randn(768).astype(np.float32),
        "head.weight": rng.randn(400, 768).astype(np.float32),
        "head.bias": rng.randn(400).astype(np.float32),
    }
    out = inflate_swin2d(state2d, window_size=(8, 7, 7), num_stages=2)
    # the in-range stages translated
    assert out["encoder/stage0/block0/attn/qkv_kernel"].shape == (96, 288)
    assert out["encoder/stage1/block0/mlp/fc1/kernel"].shape == (192, 768)
    assert out["encoder/patch_embed/kernel"].shape == (2, 4, 4, 3, 96)
    # nothing without a counterpart leaked into the output
    keys = "\n".join(sorted(out))
    for bad in ("downsample", "stage2", "stage3", "head", "patch_embed/norm"):
        assert bad not in keys, (bad, keys)


def test_inflate_swin2d_resizes_bias_table():
    rng = np.random.RandomState(1)
    state2d = {
        "layers.0.blocks.0.attn.relative_position_bias_table":
            rng.randn(23 * 23, 4).astype(np.float32),  # 12x12 2D window
    }
    out = inflate_swin2d(state2d, window_size=(2, 7, 7))
    tbl = out["encoder/stage0/block0/attn/relative_position_bias_table"]
    assert tbl.shape == (3 * 13 * 13, 4)


def test_lars_optimizer_steps():
    params = {"w": jnp.ones((4, 4))}
    tx = build_optimizer("lars", 1e-2, 1e-4, 0.9, 0.999, 1e-8)
    st = tx.init(params)
    g = {"w": jnp.ones((4, 4)) * 0.1}
    upd, st = tx.update(g, st, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))
