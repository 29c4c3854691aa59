"""Torch reference-checkpoint translation: every parameter of the flagship
VADModel must be produced by translating a reference-named state_dict, with
the right layout transposes."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vadcl_tpu.core.config import ModelConfig
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.train.checkpoint import _path_str, tolerant_merge
from vadcl_tpu.train.torch_import import translate_torch_state


def _inverse_torch_name(path: str):
    """Our flat param path -> (torch key, torch-layout shape transform).
    This is the translation spec written backwards; the test fails if the
    forward translator disagrees with it anywhere."""
    def linear(tkey):
        return tkey, lambda s: (s[1], s[0])

    def conv(tkey):
        return tkey, lambda s: (s[4], s[3], s[0], s[1], s[2])

    def convT(tkey):
        return tkey, lambda s: (s[3], s[4], s[0], s[1], s[2])

    ident = lambda tkey: (tkey, lambda s: s)

    m = re.fullmatch(r"params/encoder/patch_embed/kernel", path)
    if m:
        return conv("encoder.patch_embed.proj.weight")
    if path == "params/encoder/patch_embed/bias":
        return ident("encoder.patch_embed.proj.bias")

    m = re.fullmatch(
        r"params/(encoder|decoder)/stage(\d+)/block(\d+)/(.*)", path
    )
    if m:
        side = "layers" if m.group(1) == "encoder" else "ST_layers"
        base = f"{m.group(1)}.{side}.{m.group(2)}.blocks.{m.group(3)}"
        rest = m.group(4)
        table = {
            "norm1/scale": ident(base + ".norm1.weight"),
            "norm1/bias": ident(base + ".norm1.bias"),
            "norm2/scale": ident(base + ".norm2.weight"),
            "norm2/bias": ident(base + ".norm2.bias"),
            "attn/relative_position_bias_table": ident(
                base + ".attn.relative_position_bias_table"
            ),
            "attn/qkv_kernel": linear(base + ".attn.qkv.weight"),
            "attn/qkv_bias": ident(base + ".attn.qkv.bias"),
            "attn/proj_kernel": linear(base + ".attn.proj.weight"),
            "attn/proj_bias": ident(base + ".attn.proj.bias"),
            "mlp/fc1/kernel": linear(base + ".mlp.fc1.weight"),
            "mlp/fc1/bias": ident(base + ".mlp.fc1.bias"),
            "mlp/fc2/kernel": linear(base + ".mlp.fc2.weight"),
            "mlp/fc2/bias": ident(base + ".mlp.fc2.bias"),
        }
        return table[rest]

    m = re.fullmatch(
        r"(params|batch_stats)/(encoder|decoder)/inception(\d+)/(\w+)/(conv3d|bn)/(\w+)",
        path,
    )
    if m:
        side = "conv_layers" if m.group(2) == "encoder" else "I3D_layers"
        base = f"{m.group(2)}.{side}.{m.group(3)}.0.{m.group(4)}"
        leaf = m.group(6)
        if m.group(5) == "conv3d":
            return conv(base + ".conv3d.weight")
        if leaf == "scale":
            return ident(base + ".bn.weight")
        if leaf == "bias":
            return ident(base + ".bn.bias")
        if leaf == "mean":
            return ident(base + ".bn.running_mean")
        if leaf == "var":
            return ident(base + ".bn.running_var")

    m = re.fullmatch(r"params/encoder/downsample(\d+)/(kernel|bias)", path)
    if m:
        base = f"encoder.downsample.{m.group(1)}.0"
        return conv(base + ".weight") if m.group(2) == "kernel" else ident(base + ".bias")

    if path == "params/decoder/timedebd/kernel":
        return conv("decoder.timedebd.weight")  # predict mode layout
    if path == "params/decoder/timedebd/bias":
        return ident("decoder.timedebd.bias")
    m = re.fullmatch(r"params/decoder/upsample0/proj/(kernel|bias)", path)
    if m:
        base = "decoder.upsampling.0.proj.0"
        return convT(base + ".weight") if m.group(1) == "kernel" else ident(base + ".bias")
    if path.startswith("params/decoder/norm/"):
        leaf = path.rsplit("/", 1)[1]
        return ident("decoder.norm." + ("weight" if leaf == "scale" else "bias"))
    m = re.fullmatch(r"params/decoder/patchdebed/(deconv1|conv|deconv2)/(kernel|bias)", path)
    if m:
        idx = {"deconv1": "0", "conv": "2", "deconv2": "4"}[m.group(1)]
        base = f"decoder.patchdebed.proj.{idx}"
        if m.group(2) == "bias":
            return ident(base + ".bias")
        return (convT if m.group(1) != "conv" else conv)(base + ".weight")

    m = re.fullmatch(r"params/(cluster1|space_cluster)/norm/(scale|bias)", path)
    if m:
        return ident(
            f"{m.group(1)}.norm." + ("weight" if m.group(2) == "scale" else "bias")
        )
    m = re.fullmatch(r"params/(cluster1|space_cluster)/cluster_center", path)
    if m:
        return ident(f"{m.group(1)}.cluster_center")
    if path.startswith("params/norm/"):
        leaf = path.rsplit("/", 1)[1]
        return ident("norm." + ("weight" if leaf == "scale" else "bias"))
    raise KeyError(path)


@pytest.mark.parametrize("prefix", ["", "module."])
def test_full_flagship_translation_roundtrip(prefix):
    model = VADModel(config=ModelConfig(predict=True))
    clip = jnp.zeros((1, 4, 224, 224, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.key(0), clip)

    flat_paths = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        flat_paths[_path_str(path)] = tuple(leaf.shape)

    # synthesize a torch state dict with reference names + torch layouts
    rng = np.random.RandomState(0)
    torch_state = {}
    value_by_ours = {}
    for path, shape in flat_paths.items():
        tkey, to_torch_shape = _inverse_torch_name(path)
        tshape = to_torch_shape(shape)
        v = rng.randn(*tshape).astype(np.float32) if tshape else np.float32(rng.randn())
        torch_state[prefix + tkey] = v
        value_by_ours[path] = v
    # plus buffers the translator must skip
    torch_state[prefix + "cluster1.identity_matrix"] = np.eye(4, dtype=np.float32)

    params, stats, unmatched = translate_torch_state(torch_state, predict=True)
    assert unmatched == []

    flat = {f"params/{k}": v for k, v in params.items()}
    flat.update({f"batch_stats/{k}": v for k, v in stats.items()})

    # every model leaf covered, shapes correct
    missing = sorted(set(flat_paths) - set(flat))
    assert missing == [], missing[:10]
    extra = sorted(set(flat) - set(flat_paths))
    assert extra == [], extra[:10]
    for path in flat_paths:
        assert flat[path].shape == flat_paths[path], path

    merged, hits, misses = tolerant_merge(
        jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes),
        flat,
    )
    assert misses == []

    # spot-check a layout transpose end to end: qkv linear weight
    some = "params/encoder/stage0/block0/attn/qkv_kernel"
    np.testing.assert_array_equal(
        np.asarray(
            jax.tree_util.tree_flatten_with_path(merged)[0][0][1]
        ).shape if False else np.asarray(flat[some]),
        np.transpose(value_by_ours[some]),
    )
