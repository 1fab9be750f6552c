"""Instantiate the reference PyTorch model on CPU for parity testing.

The reference hard-codes CUDA inside its model forwards (agent.py:611, 854,
1040, 1143, 1164-1167, 1268, 323-325) and depends on ``pretrainedmodels``
(backbone.py:5, 63) which is absent from this image, so importing it needs:

- ``.cuda()`` / ``.to('cuda')`` / ``torch.cuda.FloatTensor`` shimmed to CPU;
- a stand-in ``pretrainedmodels.resnet18`` whose *state_dict naming matches
  torchvision/pretrainedmodels exactly* (conv1, bn1, layer{1..4}.{0,1},
  downsample.0/1) so that real reference checkpoints load into it and
  ``torch_import`` sees authentic key names.

This module is a test harness: production checkpoint conversion
(``torch_import``) only needs the state_dict, never the reference code.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def _install_shims() -> None:
    import torch
    import torch.nn as nn

    torch.Tensor.cuda = lambda self, *a, **k: self
    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor
        _orig_to = torch.Tensor.to

        def _to(self, *args, **kwargs):
            args = tuple("cpu" if a == "cuda" else a for a in args)
            if kwargs.get("device") == "cuda":
                kwargs["device"] = "cpu"
            return _orig_to(self, *args, **kwargs)

        torch.Tensor.to = _to

    if "pretrainedmodels" in sys.modules:
        return

    class _BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = (
                nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                              nn.BatchNorm2d(cout))
                if (stride != 1 or cin != cout) else None
            )

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + r)

    def _resnet18(num_classes=1000, pretrained=None):
        m = nn.Module()
        m.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        m.bn1 = nn.BatchNorm2d(64)
        m.relu = nn.ReLU(inplace=True)
        m.maxpool = nn.MaxPool2d(3, 2, 1)
        m.layer1 = nn.Sequential(_BasicBlock(64, 64), _BasicBlock(64, 64))
        m.layer2 = nn.Sequential(_BasicBlock(64, 128, 2), _BasicBlock(128, 128))
        m.layer3 = nn.Sequential(_BasicBlock(128, 256, 2), _BasicBlock(256, 256))
        m.layer4 = nn.Sequential(_BasicBlock(256, 512, 2), _BasicBlock(512, 512))
        return m

    pm = types.ModuleType("pretrainedmodels")
    pm.__dict__["resnet18"] = _resnet18
    sys.modules["pretrainedmodels"] = pm
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm


def build_reference_model(cfg, n_classes: int = 11):
    """Return the reference torch model for ``cfg`` in eval-capable CPU form.

    Mirrors what the reference CLIs do (train.py:176, test.py:93):
    ``get_model(cfg, n_classes)`` from /root/reference/ptsemseg/models.
    """
    _install_shims()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from ptsemseg.models import get_model as ref_get_model

    return ref_get_model(dict(cfg), n_classes)
