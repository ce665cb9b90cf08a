"""torchvision -> flax weight conversion for the ResNet backbones.

The reference initialises its image branches from torchvision pretrained
resnet18/34 (``/root/reference/network_mm/image_fe.py:19,33``).  This module
maps a torchvision ResNet ``state_dict`` (numpy tensors, NCHW/OIHW) onto the
parameter tree of ``agplace_tpu.models.resnet.ResNetFeatures`` (NHWC/HWIO).

torch itself is only needed to *load* a checkpoint; conversion operates on
numpy arrays so the compute path stays torch-free.  Also doubles as the
numerical-parity oracle in tests (random torch weights -> converted -> outputs
must match torch's forward).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

_RESNET_STAGE_BLOCKS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
}


def _conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _bn(sd: Mapping[str, Any], prefix: str):
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_resnet(
    state_dict: Mapping[str, Any],
    arch: str = "resnet18",
    num_stages: int = 3,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, batch_stats) trees for ``ResNetFeatures``.

    ``state_dict`` values may be torch tensors or numpy arrays (anything
    ``np.asarray`` accepts).
    """
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s

    stage_blocks = _RESNET_STAGE_BLOCKS[arch]
    bottleneck = arch in ("resnet50", "resnet101")
    for stage in range(num_stages):
        for b in range(stage_blocks[stage]):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_{b}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            n_convs = 3 if bottleneck else 2
            for ci in range(1, n_convs + 1):
                blk_p[f"conv{ci}"] = {
                    "kernel": _conv(sd[f"{src}.conv{ci}.weight"])
                }
                p, s = _bn(sd, f"{src}.bn{ci}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = p, s
            if f"{src}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])
                }
                p, s = _bn(sd, f"{src}.downsample.1")
                blk_p["downsample_bn"], blk_s["downsample_bn"] = p, s
            params[dst] = blk_p
            stats[dst] = blk_s
    return params, stats


def load_torchvision_resnet(arch: str = "resnet18", num_stages: int = 3,
                            pretrained: bool = True):
    """Build torchvision weights and convert.  Requires torch+torchvision
    (CPU only).  Gated so the compute path never imports torch."""
    import torchvision  # local import by design

    model = getattr(torchvision.models, arch)(
        weights="IMAGENET1K_V1" if pretrained else None)
    return convert_resnet(model.state_dict(), arch, num_stages)


def _default_weight_dirs():
    import os

    dirs = []
    env = os.environ.get("AGPLACE_WEIGHTS", "")
    if env:
        dirs.append(env)
    dirs.append(os.path.expanduser("~/.cache/agplace_tpu/weights"))
    dirs.append(os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "weights"))
    return dirs


def find_pretrained_state_dict(arch: str, path: "str | None" = None):
    """Locate a torchvision-format ``state_dict`` for ``arch``.

    Search order: explicit ``path`` (file, or directory containing
    ``{arch}*.pth``), then ``$AGPLACE_WEIGHTS``, ``~/.cache/agplace_tpu/
    weights``, ``<repo>/weights``.  Returns the loaded state dict or None.
    torch is used only to deserialize the ``.pth``.
    """
    import glob
    import os

    candidates = []
    for d in ([path] if path else []) + _default_weight_dirs():
        if d is None or not os.path.exists(d):
            continue
        if os.path.isfile(d):
            candidates.append(d)
        else:
            candidates.extend(sorted(glob.glob(os.path.join(d,
                                                            f"{arch}*.pth"))))
    for f in candidates:
        try:
            import torch

            sd = torch.load(f, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            if "conv1.weight" in sd:
                return sd
        except Exception:  # corrupt / wrong format: keep searching
            continue
    return None


def load_pretrained_resnet(arch: str, num_stages: int,
                           path: "str | None" = None):
    """(params, batch_stats) for ``ResNetFeatures`` from the best available
    pretrained source — torchvision zoo if importable+cached, else a mounted
    weights dir (``find_pretrained_state_dict``).  None if neither exists
    (zero-egress environments with no mounted weights)."""
    sd = find_pretrained_state_dict(arch, path)
    if sd is not None:
        return convert_resnet(sd, arch, num_stages)
    try:
        return load_torchvision_resnet(arch, num_stages, pretrained=True)
    except Exception:
        return None
