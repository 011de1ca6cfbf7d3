"""Round-trip the PUBLISHED checkpoint format through models/convert.py.

The TartanAir droid.pth itself is absent from this image; this fixture saves
a full torch DroidNet replica's state_dict in the checkpoint's EXACT key
format (``module.`` prefix, 3-channel update heads, GraphAgg weights —
/root/reference/dbaf/dbaf.py:38-48) via ``torch.save``, loads it through
``load_droid_weights``, and asserts f32 activation parity of every consumer
(fnet/cnet encoders, the full update op, the GraphAgg eta/upmask path).
"""

from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from dbaf_tpu.models import net as fnet_mod  # noqa: E402
from dbaf_tpu.models.convert import load_droid_weights  # noqa: E402
from tests.test_net import TEncoder, TUpdate, nchw  # noqa: E402


class TAgg(tnn.Module):
    """GraphAgg replica (droid_net.py:40-71) for state-dict key coverage."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(128, 128, 3, padding=1)
        self.conv2 = tnn.Conv2d(128, 128, 3, padding=1)
        self.eta = tnn.Sequential(
            tnn.Conv2d(128, 1, 3, padding=1), tnn.Identity(), tnn.Softplus()
        )
        self.upmask = tnn.Sequential(tnn.Conv2d(128, 8 * 8 * 9, 1, padding=0))

    def forward(self, net, ii):
        # contiguous ii (0..F-1) so unique-inverse == segment semantics
        E, C, H, W = net.shape
        net = torch.relu(self.conv1(net))
        F = int(ii.max().item()) + 1
        sums = torch.zeros((F, C, H, W))
        counts = torch.zeros(F)
        for e in range(E):
            sums[ii[e]] += net[e]
            counts[ii[e]] += 1
        net = sums / counts.clamp(min=1.0)[:, None, None, None]
        net = torch.relu(self.conv2(net))
        return 0.01 * self.eta(net), self.upmask(net)


class TDroid(tnn.Module):
    """Full reference DroidNet naming (droid_net.py:145-150)."""

    def __init__(self):
        super().__init__()
        self.fnet = TEncoder(128, "instance")
        self.cnet = TEncoder(256, "none")
        self.update = TUpdate(head_ch=3)  # published heads emit 3 channels
        self.update.agg = TAgg()


def test_published_checkpoint_roundtrip(tmp_path, rng):
    tdroid = TDroid().eval()
    # exact published format: module.-prefixed keys (dbaf.py:39-40)
    sd = OrderedDict(
        ("module." + k, v) for k, v in tdroid.state_dict().items()
    )
    path = tmp_path / "droid.pth"
    torch.save(sd, str(path))

    params = load_droid_weights(str(path))
    assert set(params) == {"fnet", "cnet", "update"}
    # head slicing applied (dbaf.py:42-45)
    assert params["update"]["delta_2"]["kernel"].shape[-1] == 2
    assert params["update"]["weight_2"]["bias"].shape == (2,)

    # --- encoder parity ---
    x = rng.normal(size=(2, 32, 40, 3)).astype(np.float32)
    for name, outdim, norm in (("fnet", 128, "instance"), ("cnet", 256, "none")):
        enc = fnet_mod.BasicEncoder(output_dim=outdim, norm=norm,
                                    dtype=jnp.float32)
        out_f = enc.apply({"params": params[name]}, jnp.asarray(x))
        with torch.no_grad():
            out_t = getattr(tdroid, name)(nchw(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(out_f), np.moveaxis(out_t, 1, -1), atol=2e-4, rtol=1e-3
        )

    # --- full update op parity (incl. GraphAgg eta/upmask) ---
    E, H, W = 4, 8, 10
    net = np.tanh(rng.normal(size=(E, H, W, 128))).astype(np.float32)
    inp = rng.normal(size=(E, H, W, 128)).astype(np.float32)
    corr = rng.normal(size=(E, H, W, 196)).astype(np.float32)
    flow = rng.normal(size=(E, H, W, 4)).astype(np.float32)
    ii = np.array([0, 0, 1, 2])

    fup = fnet_mod.UpdateModule(dtype=jnp.float32)
    net_f, delta_f, weight_f, eta_f, upmask_f = fup.apply(
        {"params": params["update"]}, jnp.asarray(net), jnp.asarray(inp),
        jnp.asarray(corr), jnp.asarray(flow), ii=jnp.asarray(ii),
        num_frames=3, upsample=True,
    )
    with torch.no_grad():
        c = tdroid.update.corr_encoder(nchw(corr))
        f = tdroid.update.flow_encoder(nchw(flow))
        net_t = tdroid.update.gru(nchw(net), nchw(inp), c, f)
        delta_t = tdroid.update.delta(net_t).numpy()
        weight_t = tdroid.update.weight(net_t).numpy()  # ends in Sigmoid
        eta_t, upmask_t = tdroid.update.agg(net_t, torch.tensor(ii))

    np.testing.assert_allclose(
        np.asarray(net_f), np.moveaxis(net_t.numpy(), 1, -1), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(delta_f), np.moveaxis(delta_t, 1, -1)[..., :2], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(weight_f), np.moveaxis(weight_t, 1, -1)[..., :2], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(eta_f), np.moveaxis(eta_t.numpy(), 1, -1)[..., 0],
        atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(upmask_f), np.moveaxis(upmask_t.numpy(), 1, -1), atol=1e-4
    )


def test_validate_rejects_malformed_checkpoint(tmp_path):
    from dbaf_tpu.models.convert import ConversionError

    tdroid = TDroid().eval()
    sd = OrderedDict(
        ("module." + k, v) for k, v in tdroid.state_dict().items()
    )
    # corrupt: drop a required key and mangle a shape
    sd.pop("module.update.gru.convz.weight")
    path = tmp_path / "bad.pth"
    torch.save(sd, str(path))
    with pytest.raises(ConversionError, match="convz"):
        load_droid_weights(str(path))
