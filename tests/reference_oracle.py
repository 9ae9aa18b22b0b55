"""Import the PyTorch reference (read-only, /root/reference) as a test oracle.

The reference is used ONLY to generate expected outputs in parity tests; no
code is copied from it. `timm` is not installed here, so a minimal functional
shim is injected for the handful of symbols the reference imports.
All oracle usage is skipped automatically when the reference tree is absent.
"""

import sys
import types
import os

REFERENCE_PATH = "/root/reference"


def reference_available():
    return os.path.isdir(os.path.join(REFERENCE_PATH, "common"))


_installed = False


def _install_timm_shim():
    """Provide the timm symbols common/mixste.py imports, nothing more."""
    global _installed
    if _installed or "timm" in sys.modules:
        _installed = True
        return
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    timm_data = types.ModuleType("timm.data")
    timm_data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    timm_data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    timm_models = types.ModuleType("timm.models")
    timm_helpers = types.ModuleType("timm.models.helpers")
    timm_helpers.load_pretrained = lambda *a, **k: None
    timm_registry = types.ModuleType("timm.models.registry")
    timm_registry.register_model = lambda fn: fn
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_

    timm.data = timm_data
    timm.models = timm_models
    timm_models.helpers = timm_helpers
    timm_models.registry = timm_registry
    timm_models.layers = timm_layers

    sys.modules["timm"] = timm
    sys.modules["timm.data"] = timm_data
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.helpers"] = timm_helpers
    sys.modules["timm.models.registry"] = timm_registry
    sys.modules["timm.models.layers"] = timm_layers
    _installed = True


def _patch_cuda_noop():
    """The reference hard-codes .cuda() in places; run it on CPU."""
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        nn_mod = torch.nn.Module
        nn_mod.cuda = lambda self, *a, **k: self
        _orig_randn = torch.randn

        def randn(*args, **kwargs):
            if kwargs.get("device") == "cuda":
                kwargs["device"] = "cpu"
            return _orig_randn(*args, **kwargs)

        torch.randn = randn
        _orig_randint = torch.randint

        def randint(*args, **kwargs):
            if kwargs.get("device") == "cuda":
                kwargs["device"] = "cpu"
            return _orig_randint(*args, **kwargs)

        torch.randint = randint
        _orig_full = torch.full

        def full(*args, **kwargs):
            if kwargs.get("device") == "cuda":
                kwargs["device"] = "cpu"
            return _orig_full(*args, **kwargs)

        torch.full = full


def import_reference(module_name):
    """Import e.g. 'common.camera' from the reference tree."""
    _install_timm_shim()
    _patch_cuda_noop()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import importlib

    return importlib.import_module(module_name)
