"""Import harness for the actual reference PyTorch code at /root/reference.

The reference imports four packages that are not installed here but whose
functionality is either trivial (logger), inert at eval time (DropPath), or
never reached by the forward path (mmcv checkpoint loader, torchvision /
skimage helpers inside misc.utils).  We inject minimal stand-ins into
``sys.modules`` so the *real* reference modules — ``model/backbone.py:28``
(``Mymodel``) and everything it builds — can be instantiated and run on CPU
with torch 2.13 for whole-model numerical parity testing.

Stubbed (reference import sites):
  * ``timm.models.layers``: ``DropPath`` (real stochastic-depth formula;
    identity in eval mode, which is how parity tests run it) and
    ``trunc_normal_`` (delegates to ``torch.nn.init.trunc_normal_``) —
    ``model/swin_transformer.py:6``.
  * ``mmcv.runner.load_checkpoint`` — only reached via
    ``SwinTransformer3D.init_weights`` with a pretrained path
    (``model/swin_transformer.py:8``), which parity tests never call.
  * ``mmaction.utils.get_root_logger`` — plain ``logging.getLogger``
    (``model/backbone.py:9``, the vendored tree's single live import).
  * ``skimage`` / ``torchvision`` — import-time placeholders for
    ``misc/utils.py:10,17``; the functions parity tests use from
    ``misc.utils`` (``psnr`` :124, ``anomly_score`` :131) touch neither.

Nothing from /root/reference is copied; it is imported read-only as the
oracle the TPU rebuild is compared against.
"""

from __future__ import annotations

import logging
import sys
import types

REFERENCE_ROOT = "/root/reference"


def install_stubs() -> None:
    import torch
    import torch.nn as nn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):
            """timm stochastic depth: identity at eval / drop_prob 0."""

            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if not self.drop_prob or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
                return x.div(keep) * mask.floor_()

        timm_layers.DropPath = DropPath
        timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm_models.layers = timm_layers
        timm.models = timm_models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers

    if "mmcv" not in sys.modules:
        mmcv = types.ModuleType("mmcv")
        runner = types.ModuleType("mmcv.runner")

        def load_checkpoint(*a, **k):  # pragma: no cover - init path only
            raise RuntimeError("mmcv.load_checkpoint stub: not available")

        runner.load_checkpoint = load_checkpoint
        mmcv.runner = runner
        sys.modules["mmcv"] = mmcv
        sys.modules["mmcv.runner"] = runner

    if "mmaction" not in sys.modules:
        mmaction = types.ModuleType("mmaction")
        utils_mod = types.ModuleType("mmaction.utils")

        def get_root_logger(log_file=None, log_level=logging.INFO):
            return logging.getLogger("reference")

        utils_mod.get_root_logger = get_root_logger
        mmaction.utils = utils_mod
        sys.modules["mmaction"] = mmaction
        sys.modules["mmaction.utils"] = utils_mod

    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        for sub in ("io", "transform", "color"):
            m = types.ModuleType(f"skimage.{sub}")
            setattr(skimage, sub, m)
            sys.modules[f"skimage.{sub}"] = m
        sys.modules["skimage"] = skimage

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv_f = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tv_t
        tv_t.functional = tv_f
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision.transforms.functional"] = tv_f


def import_reference():
    """Returns (model.backbone, misc.utils) from the real reference tree."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import model.backbone as ref_backbone  # noqa: E402
    from misc import utils as ref_utils  # noqa: E402

    return ref_backbone, ref_utils


class RefArgs:
    """The only attribute Mymodel reads from args (model/backbone.py:35)."""

    def __init__(self, patch_size=(2, 4, 4)):
        self.patch_size = patch_size
