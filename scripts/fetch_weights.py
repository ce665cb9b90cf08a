#!/usr/bin/env python
"""Fetch the pretrained backbone weights the reference trains from, into a
directory that ``agplace_tpu`` discovers via ``$AGPLACE_WEIGHTS``.

The reference initialises every image backbone from the torchvision zoo
(``pretrained=True``: ``/root/reference/network_mm/image_fe.py:14-56``,
``model/network.py:120-150``), HF for ViT (``model/network.py:173-175``)
and the SHI-Labs URL registry for CCT (``model/cct/cct.py:32-60``).  On a
zero-egress host, run this script on any machine WITH egress, copy the
directory across, and point ``AGPLACE_WEIGHTS`` at it:

    python scripts/fetch_weights.py --out ~/agplace_weights \
        --archs resnet18,resnet34,vgg16
    export AGPLACE_WEIGHTS=~/agplace_weights

Every file is a plain torch ``state_dict`` saved as ``{arch}.pth`` — the
format ``agplace_tpu.utils.torch_convert.find_pretrained_state_dict``
searches for.  With weights present, ``--pretrained true`` grafts them into
all towers and ``tests/test_pretrained.py`` stops skipping.
"""

from __future__ import annotations

import argparse
import os
import sys

# torchvision zoo URLs (IMAGENET1K_V1 weights) — stable, versioned assets
TORCHVISION_URLS = {
    "resnet18": "https://download.pytorch.org/models/resnet18-f37072fd.pth",
    "resnet34": "https://download.pytorch.org/models/resnet34-b627a593.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-0676ba61.pth",
    "resnet101":
        "https://download.pytorch.org/models/resnet101-63fe2227.pth",
    "vgg16": "https://download.pytorch.org/models/vgg16-397923af.pth",
    "alexnet":
        "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth",
    "convnext_tiny":
        "https://download.pytorch.org/models/convnext_tiny-983f1562.pth",
    "squeezenet10":
        "https://download.pytorch.org/models/squeezenet1_0-b66bff10.pth",
    "squeezenet11":
        "https://download.pytorch.org/models/squeezenet1_1-b8a52dc0.pth",
}

# the CCT registry entry the reference uses for --backbone cct384
# (model/cct/cct.py:32-60, cct_14_7x2_384)
CCT_URLS = {
    "cct384": ("https://shi-labs.com/projects/cct/checkpoints/pretrained/"
               "cct_14_7x2_384_imagenet.pth"),
}

HF_MODELS = {
    "vit": "google/vit-base-patch16-224-in21k",
    "vit384": "google/vit-base-patch16-384",
}


def fetch(arch: str, out_dir: str) -> str:
    import torch

    dst = os.path.join(out_dir, f"{arch}.pth")
    if os.path.exists(dst):
        print(f"[skip] {dst} exists")
        return dst
    if arch in HF_MODELS:
        from transformers import ViTModel

        model = ViTModel.from_pretrained(HF_MODELS[arch],
                                         add_pooling_layer=False)
        torch.save(model.state_dict(), dst)
    elif arch in TORCHVISION_URLS or arch in CCT_URLS:
        url = TORCHVISION_URLS.get(arch) or CCT_URLS[arch]
        sd = torch.hub.load_state_dict_from_url(url, map_location="cpu",
                                                check_hash=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        torch.save(sd, dst)
    else:
        choices = sorted([*TORCHVISION_URLS, *CCT_URLS, *HF_MODELS])
        raise SystemExit(f"unknown arch {arch!r}; choices: {choices}")
    print(f"[ok]   {arch} -> {dst}")
    return dst


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default=os.environ.get(
        "AGPLACE_WEIGHTS", os.path.expanduser(
            "~/.cache/agplace_tpu/weights")))
    ap.add_argument("--archs", default="resnet18,resnet34",
                    help="comma list; 'all' fetches everything")
    args = ap.parse_args()

    archs = (sorted([*TORCHVISION_URLS, *CCT_URLS, *HF_MODELS])
             if args.archs == "all" else args.archs.split(","))
    os.makedirs(args.out, exist_ok=True)
    failures = []
    for a in archs:
        try:
            fetch(a.strip(), args.out)
        except Exception as e:  # zero-egress / transient: report, continue
            failures.append((a, e))
            print(f"[fail] {a}: {e}", file=sys.stderr)
    if failures:
        sys.exit(1)
    print(f"\nexport AGPLACE_WEIGHTS={args.out}")


if __name__ == "__main__":
    main()
