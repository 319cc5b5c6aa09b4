#!/usr/bin/env python
"""Export lpips(net='vgg') weights to the npz convention of
gta_tpu/utils/lpips_jax.py.

Run wherever `torchvision` and `lpips` are installed (this container has
neither — zero egress):

    python scripts/export_lpips_weights.py lpips_vgg.npz

then set LPIPS_WEIGHTS=/path/to/lpips_vgg.npz for evaluate.py.
"""

import sys

import numpy as np


def main(out_path: str):
    import lpips
    import torch

    model = lpips.LPIPS(net="vgg")
    params = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] + \
            [m for m in model.net.slice3] + [m for m in model.net.slice4] + \
            [m for m in model.net.slice5]
    conv_layers = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(conv_layers) == 13, len(conv_layers)
    for i, conv in enumerate(conv_layers):
        # torch OIHW -> jax HWIO
        params[f"conv{i}_w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        params[f"conv{i}_b"] = conv.bias.detach().numpy()
    for j, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        params[f"lin{j}_w"] = w.reshape(-1)
    np.savez(out_path, **params)
    print(f"wrote {out_path} ({len(params)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz")
