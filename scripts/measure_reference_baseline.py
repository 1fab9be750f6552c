"""Measure the PyTorch reference's eval throughput on this host (CPU).

The reference hard-codes CUDA in its model forwards (agent.py:611, 1040,
1164-1167 ...) and no GPU exists in this image, so `.cuda()`/`torch.cuda`
are monkeypatched to CPU no-ops. Records frames/sec (frames = B*N camera
views per forward) for the flagship mrms_when2com (MIMOcom) eval path.

Writes the result row appended to BASELINE.md by hand — run and copy.
"""

import sys
import time

import torch

sys.path.insert(0, "/root/reference")

# CPU shims for the reference's hard-coded CUDA calls
torch.Tensor.cuda = lambda self, *a, **k: self
torch.cuda.FloatTensor = torch.FloatTensor

# torchvision / pretrainedmodels are not in this image; provide a minimal
# torch ResNet-18 with the attribute surface the reference touches
# (conv1, bn1, relu, maxpool, layer1..layer4 — backbone.py:63-70).
import types  # noqa: E402

import torch.nn as nn  # noqa: E402


class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = (
            nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                          nn.BatchNorm2d(cout))
            if (stride != 1 or cin != cout) else None
        )

    def forward(self, x):
        r = x if self.down is None else self.down(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + r)


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


_pm = types.ModuleType("pretrainedmodels")
_pm.__dict__["resnet18"] = _resnet18
sys.modules["pretrainedmodels"] = _pm
_tv = types.ModuleType("torchvision")
_tvm = types.ModuleType("torchvision.models")
_tv.models = _tvm
sys.modules["torchvision"] = _tv
sys.modules["torchvision.models"] = _tvm

from ptsemseg.models import get_model  # noqa: E402

CFG = {
    "model": {
        "arch": "MIMOcom", "agent_num": 6, "shared_policy": True,
        "shared_img_encoder": "unified", "attention": "general",
        "sparse": False, "query": True, "query_size": 32, "key_size": 1024,
        "enc_backbone": "resnet_encoder", "dec_backbone": "simple_decoder",
        "feat_squeezer": -1, "feat_channel": 512, "multiple_output": True,
    },
    "data": {"img_rows": 512, "img_cols": 512},
}


def main(batch=2, iters=5, warmup=2):
    n = CFG["model"]["agent_num"]
    model = get_model(CFG, 11)
    model.eval()
    x = torch.randn(batch, 3 * n, 512, 512)
    with torch.no_grad():
        for _ in range(warmup):
            model(x, training=False, MO_flag=True, inference="activated")
        t0 = time.time()
        for _ in range(iters):
            model(x, training=False, MO_flag=True, inference="activated")
        dt = (time.time() - t0) / iters
    frames = batch * n
    print(f"torch-cpu eval: {dt*1000:.1f} ms/step, {frames/dt:.3f} frames/sec "
          f"(batch={batch}, N={n}, 512x512, activated)")
    return frames / dt


if __name__ == "__main__":
    main()
