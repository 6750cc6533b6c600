"""Golden: reference DDDNet Feature-tower forward (torch) on fixed input
with fixed weights, for numeric parity of the Flax port (convs, dilations,
BN, avg-pool SPP, align_corners=True bilinear upsampling).

The deconv-containing submodules (Matching tail, Decoder) intentionally use
flax 'SAME' transpose-conv geometry instead of torch k4s2p1 kernel
alignment, so parity is asserted on the deconv-free Feature tower.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests/golden")
from generate_golden import install_stubs

install_stubs()
# dddnet.py imports skimage.io; load the module file directly to avoid the
# dfdp package __init__ chain (dataset deps)
import types

skio = types.ModuleType("skimage.io")
sys.modules["skimage.io"] = skio
sys.modules["skimage"].io = skio

import importlib.util

import torch

spec = importlib.util.spec_from_file_location(
    "ref_dddnet", "/root/reference/dfdp/dddnet/dddnet.py")
ref_dddnet = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref_dddnet)
Feature = ref_dddnet.Feature


def main():
    torch.manual_seed(0)
    feat = Feature().eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    for m in feat.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_(0, 0.1)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 3, 128, 192)).astype(np.float32)
    with torch.no_grad():
        y = feat(torch.tensor(x)).numpy()

    out = {"x": x, "y": y}
    for k, v in feat.state_dict().items():
        out[f"w/{k}"] = v.numpy()
    np.savez("/root/repo/tests/golden/feature_tower.npz", **out)
    print("saved; out shape", y.shape, "std", y.std())


if __name__ == "__main__":
    main()
