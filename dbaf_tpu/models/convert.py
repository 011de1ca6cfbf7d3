"""PyTorch DROID checkpoint -> Flax parameter conversion.

Reproduces the reference's checkpoint surgery
(/root/reference/dbaf/dbaf.py:38-48): strip the ``module.`` prefix and slice
the update heads' out-channels to the first two (the published DROID-SLAM
TartanAir checkpoint emits 3 channels; DBA-Fusion uses 2).

Conversion rules:
* conv weights OIHW -> HWIO;
* torch sequential indices become name suffixes (``corr_encoder.0`` ->
  ``corr_encoder_0``) matching the Flax module names in
  :mod:`dbaf_tpu.models.net`;
* norm layers carry no parameters (InstanceNorm2d affine=False / 'none').
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np

# update heads that must be sliced to 2 output channels
_HEAD_SLICE = {
    ("update", "delta_2", "kernel"): 2,
    ("update", "delta_2", "bias"): 2,
    ("update", "weight_2", "kernel"): 2,
    ("update", "weight_2", "bias"): 2,
}


def _translate_key(key: str) -> Tuple[str, ...]:
    """torch state-dict key -> flax param path (tuple of scope names)."""
    key = re.sub(r"^module\.", "", key)
    # layerN.B.xxx -> layerN_B.xxx
    key = re.sub(r"\.layer(\d)\.(\d)\.", r".layer\1_\2.", key)
    # downsample.0 -> downsample (the .1 norm has no params)
    key = key.replace(".downsample.0.", ".downsample.")
    # sequential heads: name.IDX. -> name_IDX.
    key = re.sub(
        r"\.(corr_encoder|flow_encoder|weight|delta|eta|upmask)\.(\d)\.",
        r".\1_\2.",
        key,
    )
    parts = key.split(".")
    leaf = {"weight": "kernel", "bias": "bias"}[parts[-1]]
    return tuple(parts[:-1]) + (leaf,)


def convert_state_dict(
    state: Mapping[str, np.ndarray]
) -> Dict[str, object]:
    """Convert a torch state dict (numpy arrays) to a nested flax params tree."""
    tree: Dict[str, object] = {}
    for tkey, value in state.items():
        if tkey.endswith("num_batches_tracked"):
            continue
        value = np.asarray(value, dtype=np.float32)
        path = _translate_key(tkey)
        if path[-1] == "kernel" and value.ndim == 4:
            value = value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        nch = _HEAD_SLICE.get(path)
        if nch is not None:
            value = value[..., :nch] if path[-1] == "kernel" else value[:nch]
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value
    return tree


def load_droid_weights(path: str) -> Dict[str, object]:
    """Load the published DROID-SLAM .pth checkpoint and convert."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict({k: v.numpy() for k, v in state.items()})
