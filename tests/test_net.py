"""Network parity tests: Flax modules + weight converter vs an independent
torch replica of the reference architecture (extractor.py, gru.py,
droid_net.py).  Validates conv layout conversion, norm behavior, GRU algebra,
and head wiring so the published TartanAir checkpoint converts faithfully.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from dbaf_tpu.models import net as fnet_mod
from dbaf_tpu.models.convert import convert_state_dict


# ----- torch replica of the reference architecture (f32, NCHW) -----

class TResBlock(tnn.Module):
    def __init__(self, inp, planes, norm, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, padding=1, stride=stride)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1)
        mk = lambda: tnn.InstanceNorm2d(planes) if norm == "instance" else tnn.Identity()
        self.norm1, self.norm2 = mk(), mk()
        if stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride=stride), mk()
            )
        else:
            self.downsample = None

    def forward(self, x):
        y = tF.relu(self.norm1(self.conv1(x)))
        y = tF.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return tF.relu(x + y)


class TEncoder(tnn.Module):
    def __init__(self, output_dim, norm):
        super().__init__()
        D = 32
        self.conv1 = tnn.Conv2d(3, D, 7, stride=2, padding=3)
        self.norm1 = tnn.InstanceNorm2d(D) if norm == "instance" else tnn.Identity()
        self.layer1 = tnn.Sequential(TResBlock(D, D, norm), TResBlock(D, D, norm))
        self.layer2 = tnn.Sequential(TResBlock(D, 2 * D, norm, 2), TResBlock(2 * D, 2 * D, norm))
        self.layer3 = tnn.Sequential(TResBlock(2 * D, 4 * D, norm, 2), TResBlock(4 * D, 4 * D, norm))
        self.conv2 = tnn.Conv2d(4 * D, output_dim, 1)

    def forward(self, x):
        x = tF.relu(self.norm1(self.conv1(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv2(x)


class TGRU(tnn.Module):
    def __init__(self, h=128, i=320):
        super().__init__()
        self.convz = tnn.Conv2d(h + i, h, 3, padding=1)
        self.convr = tnn.Conv2d(h + i, h, 3, padding=1)
        self.convq = tnn.Conv2d(h + i, h, 3, padding=1)
        self.w = tnn.Conv2d(h, h, 1)
        self.convz_glo = tnn.Conv2d(h, h, 1)
        self.convr_glo = tnn.Conv2d(h, h, 1)
        self.convq_glo = tnn.Conv2d(h, h, 1)

    def forward(self, net, *inputs):
        inp = torch.cat(inputs, dim=1)
        net_inp = torch.cat([net, inp], dim=1)
        b, c, h, w = net.shape
        glo = torch.sigmoid(self.w(net)) * net
        glo = glo.view(b, c, h * w).mean(-1).view(b, c, 1, 1)
        z = torch.sigmoid(self.convz(net_inp) + self.convz_glo(glo))
        r = torch.sigmoid(self.convr(net_inp) + self.convr_glo(glo))
        q = torch.tanh(self.convq(torch.cat([r * net, inp], dim=1)) + self.convq_glo(glo))
        return (1 - z) * net + z * q


class TUpdate(tnn.Module):
    def __init__(self, head_ch=3):
        super().__init__()
        cor_planes = 4 * 49
        self.corr_encoder = tnn.Sequential(
            tnn.Conv2d(cor_planes, 128, 1), tnn.ReLU(),
            tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU())
        self.flow_encoder = tnn.Sequential(
            tnn.Conv2d(4, 128, 7, padding=3), tnn.ReLU(),
            tnn.Conv2d(128, 64, 3, padding=1), tnn.ReLU())
        self.weight = tnn.Sequential(
            tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(128, head_ch, 3, padding=1), tnn.Sigmoid())
        self.delta = tnn.Sequential(
            tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(128, head_ch, 3, padding=1))
        self.gru = TGRU(128, 128 + 128 + 64)

    def forward(self, net, inp, corr, flow):
        c = self.corr_encoder(corr)
        f = self.flow_encoder(flow)
        net = self.gru(net, inp, c, f)
        return net, self.delta(net), self.weight(net)


def to_flax_tree(tmodule, prefix):
    state = {f"{prefix}.{k}": v.detach().numpy() for k, v in tmodule.state_dict().items()}
    return convert_state_dict(state)


def nchw(x):
    return torch.tensor(np.moveaxis(np.asarray(x), -1, 1))


@pytest.mark.parametrize("norm,outdim", [("instance", 128), ("none", 256)])
def test_encoder_parity(rng, norm, outdim):
    tenc = TEncoder(outdim, norm).eval()
    params = to_flax_tree(tenc, "enc")["enc"]

    x = rng.normal(size=(2, 32, 40, 3)).astype(np.float32)
    fenc = fnet_mod.BasicEncoder(output_dim=outdim, norm=norm, dtype=jnp.float32)
    out_f = fenc.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tenc(nchw(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(out_f), np.moveaxis(out_t, 1, -1), atol=2e-4, rtol=1e-3
    )


def test_gru_parity(rng):
    tgru = TGRU().eval()
    params = to_flax_tree(tgru, "gru")["gru"]
    net = rng.normal(size=(2, 8, 10, 128)).astype(np.float32)
    inp = rng.normal(size=(2, 8, 10, 320)).astype(np.float32)
    fgru = fnet_mod.ConvGRU(128, dtype=jnp.float32)
    out_f = fgru.apply({"params": params}, jnp.asarray(net), jnp.asarray(inp))
    with torch.no_grad():
        out_t = tgru(nchw(net), nchw(inp)).numpy()
    np.testing.assert_allclose(np.asarray(out_f), np.moveaxis(out_t, 1, -1), atol=1e-4)


def test_update_parity_with_head_slicing(rng):
    tup = TUpdate(head_ch=3).eval()  # checkpoint-style 3-channel heads
    params = to_flax_tree(tup, "update")["update"]
    # sliced kernels
    assert params["delta_2"]["kernel"].shape[-1] == 2
    assert params["weight_2"]["bias"].shape == (2,)

    E, H, W = 3, 8, 10
    net = np.tanh(rng.normal(size=(E, H, W, 128))).astype(np.float32)
    inp = rng.normal(size=(E, H, W, 128)).astype(np.float32)
    corr = rng.normal(size=(E, H, W, 196)).astype(np.float32)
    flow = rng.normal(size=(E, H, W, 4)).astype(np.float32)

    fup = fnet_mod.UpdateModule(dtype=jnp.float32)
    net_f, delta_f, weight_f, _, _ = fup.apply(
        {"params": params}, jnp.asarray(net), jnp.asarray(inp),
        jnp.asarray(corr), jnp.asarray(flow)
    )
    with torch.no_grad():
        net_t, delta_t, weight_t = tup(nchw(net), nchw(inp), nchw(corr), nchw(flow))
    np.testing.assert_allclose(np.asarray(net_f), np.moveaxis(net_t.numpy(), 1, -1), atol=1e-4)
    # reference slices head outputs to first 2 channels (droid_net.py:127-128)
    np.testing.assert_allclose(
        np.asarray(delta_f), np.moveaxis(delta_t.numpy(), 1, -1)[..., :2], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(weight_f), np.moveaxis(weight_t.numpy(), 1, -1)[..., :2], atol=1e-4
    )


def test_update_accepts_raw_corr_layout(rng):
    """UpdateModule consumes the fused kernels' raw 1024-ch block layout
    (ops/corr_pallas.raw_corr_index) identically to the 196-ch reference
    layout: the scattered corr_encoder_0 weight zeroes the off-block
    cross-level products."""
    from dbaf_tpu.ops.corr_pallas import raw_corr_index

    E, H, W = 2, 8, 10
    net = np.tanh(rng.normal(size=(E, H, W, 128))).astype(np.float32)
    inp = rng.normal(size=(E, H, W, 128)).astype(np.float32)
    corr = rng.normal(size=(E, H, W, 196)).astype(np.float32)
    flow = rng.normal(size=(E, H, W, 4)).astype(np.float32)

    idx = np.asarray(raw_corr_index())
    raw = rng.normal(size=(E, H, W, 1024)).astype(np.float32)  # garbage base
    pos = np.where(idx >= 0)[0]
    raw[..., pos] = corr[..., idx[pos]]

    fup = fnet_mod.UpdateModule(dtype=jnp.float32)
    params = fup.init(
        jax.random.PRNGKey(0), jnp.asarray(net), jnp.asarray(inp),
        jnp.asarray(corr), jnp.asarray(flow)
    )["params"]
    assert params["corr_encoder_0"]["kernel"].shape == (1, 1, 196, 128)
    o196 = fup.apply({"params": params}, jnp.asarray(net), jnp.asarray(inp),
                     jnp.asarray(corr), jnp.asarray(flow))
    oraw = fup.apply({"params": params}, jnp.asarray(net), jnp.asarray(inp),
                     jnp.asarray(raw), jnp.asarray(flow))
    for a, b in zip(o196[:3], oraw[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_extract_features_shapes(rng):
    model = fnet_mod.DroidNet(dtype=jnp.float32)
    imgs = jnp.asarray(rng.integers(0, 255, size=(1, 64, 80, 3)), dtype=jnp.float32)
    import jax
    params = model.init(
        jax.random.PRNGKey(0), imgs, method=model.extract_features
    )["params"]
    fmaps, net, inp = model.apply(
        {"params": params}, imgs, method=model.extract_features
    )
    assert fmaps.shape == (1, 8, 10, 128)
    assert net.shape == (1, 8, 10, 128)
    assert inp.shape == (1, 8, 10, 128)
    assert np.all(np.asarray(net) <= 1.0) and np.all(np.asarray(net) >= -1.0)
    assert np.all(np.asarray(inp) >= 0.0)
