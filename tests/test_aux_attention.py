"""Torch golden parity for the aux attention library (VERDICT r1 #4).

Each test builds the reference block fresh in torch from its documented
semantics (reference: slowfast/models/wdf_attention_helper.py:97-379),
copies weights into our flax module, and compares outputs in f32.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from efficient_slowfast_tpu.ops.attention import (
    ChannelAttention, ContextBlock3D, NonLocalBlock, StripeNonLocalBlock,
)
from efficient_slowfast_tpu.utils import torch_import as ti

TOL = dict(rtol=1e-4, atol=1e-5)


def to_cl(x):  # NCTHW -> NTHWC
    return jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))


def from_cl(y):  # NTHWC -> NCTHW
    return np.transpose(np.asarray(y), (0, 4, 1, 2, 3))


def conv_w(t):  # torch (O,I,kT,kH,kW) → flax (kT,kH,kW,I,O)
    return jnp.asarray(ti.conv3d_weight(t.weight.detach().numpy()))


def conv_b(t):
    return jnp.asarray(t.bias.detach().numpy())


def test_channel_attention_matches_torch():
    """SE gate with residual: x*sigmoid(up(relu(down(avg(x))))) + x
    (reference :97-124)."""
    torch.manual_seed(0)
    c, red = 16, 4
    down = tnn.Conv3d(c, c // red, 1, bias=True)
    up = tnn.Conv3d(c // red, c, 1, bias=True)
    x = torch.randn(2, c, 3, 5, 5)
    with torch.no_grad():
        y = torch.sigmoid(up(torch.relu(down(x.mean((2, 3, 4), keepdim=True)))))
        ref = (x * y + x).numpy()

    m = ChannelAttention(reduction=red)
    xj = to_cl(x.numpy())
    v = m.init(jax.random.PRNGKey(0), xj)
    params = {"params": {
        "down": {"conv": {"kernel": conv_w(down), "bias": conv_b(down)}},
        "up": {"conv": {"kernel": conv_w(up), "bias": conv_b(up)}},
    }}
    out = from_cl(m.apply(params, xj))
    np.testing.assert_allclose(out, ref, **TOL)


@pytest.mark.parametrize("instance,sub_sample", [("soft", False),
                                                 ("dot", False),
                                                 ("soft", True)])
def test_nonlocal_block_matches_torch(instance, sub_sample):
    """Embedded-gaussian non-local (reference :129-195): softmax WITHOUT
    d^-0.5 scaling; dot variant divides by token count; W conv + BN."""
    torch.manual_seed(1)
    c, inner = 8, 4
    g = tnn.Conv3d(c, inner, 1)
    theta = tnn.Conv3d(c, inner, 1)
    phi = tnn.Conv3d(c, inner, 1)
    w = tnn.Conv3d(inner, c, 1)
    bn = tnn.BatchNorm3d(c)
    bn.weight.data.normal_()
    bn.bias.data.normal_()
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)
    bn.eval()
    x = torch.randn(2, c, 2, 4, 4)
    with torch.no_grad():
        gx, px = g(x), phi(x)
        if sub_sample:
            pool = tnn.MaxPool3d((1, 2, 2))
            gx, px = pool(gx), pool(px)
        b = x.shape[0]
        gv = gx.reshape(b, inner, -1).permute(0, 2, 1)
        tv = theta(x).reshape(b, inner, -1).permute(0, 2, 1)
        pv = px.reshape(b, inner, -1)
        f = torch.matmul(tv, pv)
        f = F.softmax(f, -1) if instance == "soft" else f / f.shape[1]
        y = torch.matmul(f, gv).permute(0, 2, 1).reshape(
            b, inner, *x.shape[2:])
        ref = (bn(w(y)) + x).numpy()

    m = NonLocalBlock(inter_channels=inner, sub_sample=sub_sample,
                      instance=instance)
    xj = to_cl(x.numpy())
    v = m.init(jax.random.PRNGKey(0), xj)
    params = {
        "params": {
            "g": {"conv": {"kernel": conv_w(g), "bias": conv_b(g)}},
            "theta": {"conv": {"kernel": conv_w(theta), "bias": conv_b(theta)}},
            "phi": {"conv": {"kernel": conv_w(phi), "bias": conv_b(phi)}},
            "w": {"conv": {"kernel": conv_w(w), "bias": conv_b(w)}},
            "w_bn": {"bn": {"scale": jnp.asarray(bn.weight.detach().numpy()),
                            "bias": jnp.asarray(bn.bias.detach().numpy())}},
        },
        "batch_stats": {
            "w_bn": {"bn": {"mean": jnp.asarray(bn.running_mean.numpy()),
                            "var": jnp.asarray(bn.running_var.numpy())}},
        },
    }
    out = from_cl(m.apply(params, xj, train=False))
    np.testing.assert_allclose(out, ref, **TOL)


@pytest.mark.parametrize("pool_type", ["mean", "max"])
def test_stripe_nonlocal_matches_torch(pool_type):
    """Stripe descriptors → non-local over (T × stripe) tokens → broadcast
    back over each stripe footprint (reference :198-273)."""
    torch.manual_seed(2)
    c, inner, stripe = 8, 4, 2
    g = tnn.Conv3d(c, inner, 1)
    theta = tnn.Conv3d(c, inner, 1)
    phi = tnn.Conv3d(c, inner, 1)
    w = tnn.Conv3d(inner, c, 1)
    bn = tnn.BatchNorm3d(c)
    bn.weight.data.normal_(); bn.bias.data.normal_()
    bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
    bn.eval()
    x = torch.randn(2, c, 3, 4, 5)
    b, _, t, h, wd = x.shape
    hs = h // stripe
    with torch.no_grad():
        xr = x.reshape(b * c * t, stripe, hs, wd)
        if pool_type == "mean":
            d = tnn.AdaptiveAvgPool2d(1)(xr)
        else:
            d = tnn.AdaptiveMaxPool2d(1)(xr)
        d = d.reshape(b, c, t, stripe, 1)
        gv = g(d).reshape(b, inner, -1).permute(0, 2, 1)
        tv = theta(d).reshape(b, inner, -1).permute(0, 2, 1)
        pv = phi(d).reshape(b, inner, -1)
        f = F.softmax(torch.matmul(tv, pv), -1)
        y = torch.matmul(f, gv).permute(0, 2, 1).reshape(b, inner, t, stripe, 1)
        wy = bn(w(y))
        wy = wy.repeat(1, 1, 1, 1, hs * wd).reshape(b, c, t, h, wd)
        ref = (wy + x).numpy()

    m = StripeNonLocalBlock(stripe=stripe, inter_channels=inner,
                            pool_type=pool_type)
    xj = to_cl(x.numpy())
    v = m.init(jax.random.PRNGKey(0), xj)
    params = {
        "params": {
            "g": {"conv": {"kernel": conv_w(g), "bias": conv_b(g)}},
            "theta": {"conv": {"kernel": conv_w(theta), "bias": conv_b(theta)}},
            "phi": {"conv": {"kernel": conv_w(phi), "bias": conv_b(phi)}},
            "w": {"conv": {"kernel": conv_w(w), "bias": conv_b(w)}},
            "w_bn": {"bn": {"scale": jnp.asarray(bn.weight.detach().numpy()),
                            "bias": jnp.asarray(bn.bias.detach().numpy())}},
        },
        "batch_stats": {
            "w_bn": {"bn": {"mean": jnp.asarray(bn.running_mean.numpy()),
                            "var": jnp.asarray(bn.running_var.numpy())}},
        },
    }
    out = from_cl(m.apply(params, xj, train=False))
    np.testing.assert_allclose(out, ref, **TOL)


def test_context_block_matches_torch():
    """GCNet: attention-pooled context → conv-LN-relu-conv → channel add
    (reference :289-379, mmcv semantics)."""
    torch.manual_seed(3)
    c = 8
    planes = c  # ratio 1.0
    conv_mask = tnn.Conv3d(c, 1, 1)
    add_down = tnn.Conv3d(c, planes, 1)
    ln = tnn.LayerNorm([planes, 1, 1, 1])
    ln.weight.data.normal_(); ln.bias.data.normal_()
    add_up = tnn.Conv3d(planes, c, 1)
    x = torch.randn(2, c, 2, 4, 4)
    with torch.no_grad():
        b = x.shape[0]
        inp = x.view(b, c, -1).unsqueeze(1)                  # (B,1,C,N)
        mask = conv_mask(x).view(b, 1, -1)
        mask = F.softmax(mask, dim=2).unsqueeze(-1)          # (B,1,N,1)
        ctx = torch.matmul(inp, mask).view(b, c, 1, 1, 1)
        term = add_up(torch.relu(ln(add_down(ctx))))
        ref = (x + term).numpy()

    m = ContextBlock3D(ratio=1.0, fusion_types=("channel_add",))
    xj = to_cl(x.numpy())
    v = m.init(jax.random.PRNGKey(0), xj)
    params = {"params": {
        "conv_mask": {"conv": {"kernel": conv_w(conv_mask),
                               "bias": conv_b(conv_mask)}},
        "add_down": {"conv": {"kernel": conv_w(add_down),
                              "bias": conv_b(add_down)}},
        "add_ln": {"scale": jnp.asarray(ln.weight.detach().numpy().reshape(-1)),
                   "bias": jnp.asarray(ln.bias.detach().numpy().reshape(-1))},
        "add_up": {"kernel": conv_w(add_up), "bias": conv_b(add_up)},
    }}
    out = from_cl(m.apply(params, xj))
    np.testing.assert_allclose(out, ref, **TOL)
