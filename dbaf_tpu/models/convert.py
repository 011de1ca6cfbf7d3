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
    _fuse_conv_heads(tree)
    return tree


def _fuse_conv_heads(tree: Dict[str, object]) -> None:
    """Repack torch conv weights into the fused layouts of models/net.py.

    Exact algebra (slices/concats of HWIO kernels, no arithmetic):
    * GRU convz/convr/convq (K = h+i over ``cat[net, inp]``) are split at
      the ``h`` boundary of the contraction dim -- the inp halves stack into
      ``convzrq_i`` (carrying all three biases), the net halves become the
      bias-free ``convzr_n`` / ``convq_n``;
    * convz_glo/convr_glo/convq_glo stack into ``convzrq_glo``;
    * delta_0/weight_0 stack into ``dw_0``.
    """
    for v in tree.values():
        if isinstance(v, dict):
            _fuse_conv_heads(v)
    if all(
        isinstance(tree.get(n), dict) and "kernel" in tree[n]
        for n in ("convz", "convr", "convq")
    ):
        kz, kr, kq = (tree.pop(n) for n in ("convz", "convr", "convq"))
        h = kz["kernel"].shape[-1]
        tree["convzrq_i"] = {
            "kernel": np.concatenate(
                [k["kernel"][:, :, h:] for k in (kz, kr, kq)], axis=-1
            ),
            "bias": np.concatenate([k["bias"] for k in (kz, kr, kq)]),
        }
        tree["convzr_n"] = {
            "kernel": np.concatenate(
                [kz["kernel"][:, :, :h], kr["kernel"][:, :, :h]], axis=-1
            )
        }
        tree["convq_n"] = {"kernel": kq["kernel"][:, :, :h]}
    if "convz_glo" in tree and "convr_glo" in tree and "convq_glo" in tree:
        gz, gr, gq = (
            tree.pop(n) for n in ("convz_glo", "convr_glo", "convq_glo")
        )
        tree["convzrq_glo"] = {
            "kernel": np.concatenate(
                [g["kernel"] for g in (gz, gr, gq)], axis=-1
            ),
            "bias": np.concatenate([g["bias"] for g in (gz, gr, gq)]),
        }
    if "delta_0" in tree and "weight_0" in tree:
        d0, w0 = tree.pop("delta_0"), tree.pop("weight_0")
        tree["dw_0"] = {
            "kernel": np.concatenate([d0["kernel"], w0["kernel"]], axis=-1),
            "bias": np.concatenate([d0["bias"], w0["bias"]]),
        }


class ConversionError(RuntimeError):
    """Converted checkpoint does not match the DROID architecture."""


# critical post-conversion paths and their exact kernel shapes; a checkpoint
# from a different architecture fails fast here with a named path instead of
# a cryptic flax scope error at first apply
_EXPECTED = {
    ("fnet", "conv1", "kernel"): (7, 7, 3, 32),
    ("fnet", "conv2", "kernel"): (1, 1, 128, 128),
    ("fnet", "layer1_0", "conv1", "kernel"): (3, 3, 32, 32),
    ("fnet", "layer3_1", "conv2", "kernel"): (3, 3, 128, 128),
    ("cnet", "conv2", "kernel"): (1, 1, 128, 256),
    ("update", "corr_encoder_0", "kernel"): (1, 1, 196, 128),
    ("update", "flow_encoder_0", "kernel"): (7, 7, 4, 128),
    ("update", "dw_0", "kernel"): (3, 3, 128, 256),
    ("update", "delta_2", "kernel"): (3, 3, 128, 2),
    ("update", "weight_2", "kernel"): (3, 3, 128, 2),
    ("update", "gru", "convzrq_i", "kernel"): (3, 3, 320, 384),
    ("update", "gru", "convzr_n", "kernel"): (3, 3, 128, 256),
    ("update", "gru", "convq_n", "kernel"): (3, 3, 128, 128),
    ("update", "gru", "convzrq_glo", "kernel"): (1, 1, 128, 384),
    ("update", "gru", "w", "kernel"): (1, 1, 128, 128),
}


def validate_params(tree: Mapping[str, object]) -> None:
    """Check the converted tree against the DROID architecture; raise
    :class:`ConversionError` naming the first mismatching path."""
    for path, shape in _EXPECTED.items():
        node = tree
        for p in path:
            if not isinstance(node, Mapping) or p not in node:
                raise ConversionError(
                    f"checkpoint conversion: missing parameter "
                    f"{'.'.join(path)} (stopped at {p!r}) -- is this the "
                    f"published DROID-SLAM TartanAir droid.pth?"
                )
            node = node[p]
        got = tuple(np.shape(node))
        if got != shape:
            raise ConversionError(
                f"checkpoint conversion: {'.'.join(path)} has shape {got}, "
                f"expected {shape}"
            )


def load_droid_weights(path: str, validate: bool = True) -> Dict[str, object]:
    """Load the published DROID-SLAM .pth checkpoint and convert."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    params = convert_state_dict({k: v.numpy() for k, v in state.items()})
    if validate:
        validate_params(params)
    return params
