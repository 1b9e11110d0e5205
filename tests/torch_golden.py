"""Reference-architecture torch models, built fresh for golden parity tests.

These re-implement (from the documented reference semantics, NOT by copying)
the tiny trunks of three model families with the reference's state_dict
naming, so `utils.torch_ckpt.load_torch_checkpoint` can import their weights
into our flax models and we can compare full-model logits end to end:

- SlowFast R18 (basic transform)   reference video_model_builder.py:153-416
- SlowFastDualAttention (CMDA)     reference custom_video_model_builder.py:171-445
- SlowFastShuffleNetV2             reference custom_video_model_builder.py:448-617

All modules are eval/train-agnostic torch code; BN eps=1e-5, momentum=0.1.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------

class Stem(nn.Module):
    """conv(t,7,7)/s(1,2,2) → BN → ReLU → maxpool(1,3,3)/s(1,2,2)
    (reference stem_helper.ResNetBasicStem)."""

    def __init__(self, dim_in, dim_out, t_kernel):
        super().__init__()
        self.conv = nn.Conv3d(dim_in, dim_out, (t_kernel, 7, 7), (1, 2, 2),
                              (t_kernel // 2, 3, 3), bias=False)
        self.bn = nn.BatchNorm3d(dim_out)
        self.relu = nn.ReLU()
        self.pool_layer = nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))

    def forward(self, x):
        return self.pool_layer(self.relu(self.bn(self.conv(x))))


class PathwayStems(nn.Module):
    """Per-pathway stems named pathway{p}_stem (reference VideoModelStem)."""

    def __init__(self, dims_in, dims_out, t_kernels):
        super().__init__()
        self.n = len(dims_in)
        for p, (ci, co, tk) in enumerate(zip(dims_in, dims_out, t_kernels)):
            self.add_module(f"pathway{p}_stem", Stem(ci, co, tk))

    def forward(self, x):
        return [getattr(self, f"pathway{p}_stem")(x[p]) for p in range(self.n)]


class BasicTransform(nn.Module):
    """Tx3x3 → BN → ReLU → 1x3x3 → BN (reference resnet_helper:25-107)."""

    def __init__(self, dim_in, dim_out, t_kernel, stride):
        super().__init__()
        self.a = nn.Conv3d(dim_in, dim_out, (t_kernel, 3, 3),
                           (1, stride, stride), (t_kernel // 2, 1, 1),
                           bias=False)
        self.a_bn = nn.BatchNorm3d(dim_out)
        self.a_relu = nn.ReLU()
        self.b = nn.Conv3d(dim_out, dim_out, (1, 3, 3), 1, (0, 1, 1),
                           bias=False)
        self.b_bn = nn.BatchNorm3d(dim_out)

    def forward(self, x):
        return self.b_bn(self.b(self.a_relu(self.a_bn(self.a(x)))))


class ResBlock(nn.Module):
    """Projection shortcut when dim/stride change (reference :243-358)."""

    def __init__(self, dim_in, dim_out, t_kernel, stride):
        super().__init__()
        if dim_in != dim_out or stride != 1:
            self.branch1 = nn.Conv3d(dim_in, dim_out, 1, (1, stride, stride),
                                     0, bias=False)
            self.branch1_bn = nn.BatchNorm3d(dim_out)
        self.branch2 = BasicTransform(dim_in, dim_out, t_kernel, stride)
        self.relu = nn.ReLU()

    def forward(self, x):
        if hasattr(self, "branch1"):
            return self.relu(self.branch1_bn(self.branch1(x)) + self.branch2(x))
        return self.relu(x + self.branch2(x))


class ResStage(nn.Module):
    """Multi-pathway stage: pathway{p}_res{i} blocks (reference :361-561)."""

    def __init__(self, dims_in, dims_out, t_kernels, strides, num_blocks):
        super().__init__()
        self.n = len(dims_in)
        self.num_blocks = num_blocks
        for p in range(self.n):
            for i in range(num_blocks[p]):
                blk = ResBlock(
                    dims_in[p] if i == 0 else dims_out[p], dims_out[p],
                    t_kernels[p], strides[p] if i == 0 else 1,
                )
                self.add_module(f"pathway{p}_res{i}", blk)

    def forward(self, x):
        out = []
        for p in range(self.n):
            h = x[p]
            for i in range(self.num_blocks[p]):
                h = getattr(self, f"pathway{p}_res{i}")(h)
            out.append(h)
        return out


class FuseFastToSlow(nn.Module):
    """conv(k,1,1)/s(α,1,1) → BN → ReLU → concat (reference
    video_model_builder.py:93-150)."""

    def __init__(self, dim_in, ratio, kernel, alpha):
        super().__init__()
        self.conv_f2s = nn.Conv3d(dim_in, dim_in * ratio, (kernel, 1, 1),
                                  (alpha, 1, 1), (kernel // 2, 0, 0),
                                  bias=False)
        self.bn = nn.BatchNorm3d(dim_in * ratio)
        self.relu = nn.ReLU()

    def forward(self, x):
        fuse = self.relu(self.bn(self.conv_f2s(x[1])))
        return [torch.cat([x[0], fuse], 1), x[1]]


class BasicHead(nn.Module):
    """Per-pathway avgpool → concat → NTHWC → dropout → linear; eval:
    softmax then mean over T,H,W (reference head_helper.py:133-265)."""

    def __init__(self, dims_in, num_classes, pool_sizes, dropout=0.0):
        super().__init__()
        self.pool_sizes = pool_sizes
        if dropout > 0.0:
            self.dropout = nn.Dropout(dropout)
        self.projection = nn.Linear(sum(dims_in), num_classes, bias=True)

    def forward(self, x):
        pooled = [F.avg_pool3d(xi, tuple(ps), stride=1)
                  for xi, ps in zip(x, self.pool_sizes)]
        h = torch.cat(pooled, 1).permute(0, 2, 3, 4, 1)
        if hasattr(self, "dropout"):
            h = self.dropout(h)
        h = self.projection(h)
        if not self.training:
            h = torch.softmax(h, dim=4).mean([1, 2, 3])
        return h.view(h.shape[0], -1)


# ---------------------------------------------------------------------------
# SlowFast R18
# ---------------------------------------------------------------------------

class TorchSlowFast(nn.Module):
    """Two-pathway R18 SlowFast, basic transforms, tiny dims for tests."""

    def __init__(self, num_classes=6, width=8, alpha=4, beta_inv=8,
                 fusion_ratio=2, fusion_kernel=5, num_frames=8, crop=32,
                 depths=(2, 2, 2, 2)):
        super().__init__()
        w, beta = width, beta_inv
        # slowfast temporal kernel basis (video_model_builder.py:20-80)
        tk = [[1, 5], [1, 3], [1, 3], [3, 3], [3, 3]]
        self.s1 = PathwayStems([3, 3], [w, w // beta], tk[0])
        self.s1_fuse = FuseFastToSlow(w // beta, fusion_ratio, fusion_kernel,
                                      alpha)
        f = fusion_ratio
        self.s2 = ResStage([w + w // beta * f, w // beta], [w * 4, w * 4 // beta],
                           tk[1], [1, 1], [depths[0]] * 2)
        self.s2_fuse = FuseFastToSlow(w * 4 // beta, f, fusion_kernel, alpha)
        self.s3 = ResStage([w * 4 + w * 4 // beta * f, w * 4 // beta],
                           [w * 8, w * 8 // beta], tk[2], [2, 2], [depths[1]] * 2)
        self.s3_fuse = FuseFastToSlow(w * 8 // beta, f, fusion_kernel, alpha)
        self.s4 = ResStage([w * 8 + w * 8 // beta * f, w * 8 // beta],
                           [w * 16, w * 16 // beta], tk[3], [2, 2], [depths[2]] * 2)
        self.s4_fuse = FuseFastToSlow(w * 16 // beta, f, fusion_kernel, alpha)
        self.s5 = ResStage([w * 16 + w * 16 // beta * f, w * 16 // beta],
                           [w * 32, w * 32 // beta], tk[4], [2, 2], [depths[3]] * 2)
        s_out = crop // 32
        self.head = BasicHead(
            [w * 32, w * 32 // beta], num_classes,
            [[num_frames // alpha, s_out, s_out], [num_frames, s_out, s_out]],
        )

    def forward(self, x):
        x = self.s1([t for t in x])
        x = self.s1_fuse(x)
        x = self.s2(x)
        x = self.s2_fuse(x)
        # pool1 for slowfast arch is [1,1,1] → identity (no module, matching
        # state_dict layout since MaxPool has no params)
        x = self.s3(x)
        x = self.s3_fuse(x)
        x = self.s4(x)
        x = self.s4_fuse(x)
        x = self.s5(x)
        return self.head(x)


# ---------------------------------------------------------------------------
# CMDA (SlowFastDualAttention)
# ---------------------------------------------------------------------------

class ECA(nn.Module):
    """Adaptive avgpool → conv1d(k) over channels → sigmoid gate
    (reference wdf_attention_helper.py:57-91)."""

    def __init__(self, k_size=3):
        super().__init__()
        self.avg_pool = nn.AdaptiveAvgPool3d(1)
        self.conv = nn.Conv1d(1, 1, k_size, padding=(k_size - 1) // 2,
                              bias=False)

    def forward(self, x):
        y = self.avg_pool(x)                        # (B, C, 1, 1, 1)
        y = y.squeeze(-1).squeeze(-1).transpose(-1, -2)   # (B, 1, C)
        y = self.conv(y).transpose(-1, -2).unsqueeze(-1).unsqueeze(-1)
        return x * torch.sigmoid(y).expand_as(x)


class SpatialAttention(nn.Module):
    """QKV attention over T·H·W with learned γ residual
    (reference wdf_attention_helper.py:13-54)."""

    def __init__(self, channel, reduction=8):
        super().__init__()
        self.query_conv = nn.Conv3d(channel, channel // reduction, 1)
        self.key_conv = nn.Conv3d(channel, channel // reduction, 1)
        self.value_conv = nn.Conv3d(channel, channel, 1)
        self.gamma = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        b, c, t, h, w = x.shape
        n = t * h * w
        q = self.query_conv(x).view(b, -1, n).permute(0, 2, 1)
        k = self.key_conv(x).view(b, -1, n)
        attn = torch.softmax(torch.bmm(q, k), dim=-1)
        v = self.value_conv(x).view(b, -1, n)
        out = torch.bmm(v, attn.permute(0, 2, 1)).view(b, c, t, h, w)
        return self.gamma * out + x


class FuseFastAndSlow(nn.Module):
    """Bidirectional CMDA fusion (reference
    custom_video_model_builder.py:42-148)."""

    def __init__(self, dim_slow, dim_fast, alpha, beta_inv, reduction=1):
        super().__init__()
        self.downsample_t_of_fast = nn.MaxPool3d((alpha, 1, 1), (alpha, 1, 1))
        self.attention_channel_f2s = ECA()
        self.bn_f2s = nn.BatchNorm3d(dim_fast)
        self.relu_f2s = nn.ReLU()
        self.downsample_c_of_slow = nn.Conv3d(dim_slow, dim_slow // beta_inv,
                                              1, 1, bias=False)
        self.attention_spatial_s2f = SpatialAttention(dim_slow // beta_inv,
                                                      reduction)
        self.bn_s2f = nn.BatchNorm3d(dim_slow // beta_inv)
        self.relu_s2f = nn.ReLU()
        self.upsample_s2f = nn.Upsample(scale_factor=(alpha, 1, 1),
                                        mode="nearest")

    def forward(self, x):
        x_s, x_f = x
        f2s = self.downsample_t_of_fast(x_f)
        f2s = self.relu_f2s(self.bn_f2s(self.attention_channel_f2s(f2s)))
        s2f = self.downsample_c_of_slow(x_s)
        s2f = self.relu_s2f(self.bn_s2f(self.attention_spatial_s2f(s2f)))
        s2f = self.upsample_s2f(s2f)
        # slow-derived channels come FIRST on the fast pathway (:146)
        return [torch.cat([x_s, f2s], 1), torch.cat([s2f, x_f], 1)]


class TorchCMDA(nn.Module):
    """SlowFastDualAttention R18, tiny dims (reference :171-445)."""

    def __init__(self, num_classes=6, width=8, alpha=4, beta_inv=8,
                 num_frames=8, crop=32, depths=(2, 2, 2, 2)):
        super().__init__()
        w, beta = width, beta_inv
        tk = [[1, 5], [1, 3], [1, 3], [3, 3], [3, 3]]
        self.s1 = PathwayStems([3, 3], [w, w // beta], tk[0])
        self.s1_fuse = FuseFastAndSlow(w, w // beta, alpha, beta)
        # after fuse: slow += fastC; fast += slowC // beta
        self.s2 = ResStage([w + w // beta, w // beta + w // beta],
                           [w * 4, w * 4 // beta], tk[1], [1, 1], [depths[0]] * 2)
        self.s2_fuse = FuseFastAndSlow(w * 4, w * 4 // beta, alpha, beta)
        self.s3 = ResStage([w * 4 + w * 4 // beta, w * 4 // beta * 2],
                           [w * 8, w * 8 // beta], tk[2], [2, 2], [depths[1]] * 2)
        self.s3_fuse = FuseFastAndSlow(w * 8, w * 8 // beta, alpha, beta)
        self.s4 = ResStage([w * 8 + w * 8 // beta, w * 8 // beta * 2],
                           [w * 16, w * 16 // beta], tk[3], [2, 2], [depths[2]] * 2)
        self.s4_fuse = FuseFastAndSlow(w * 16, w * 16 // beta, alpha, beta)
        self.s5 = ResStage([w * 16 + w * 16 // beta, w * 16 // beta * 2],
                           [w * 32, w * 32 // beta], tk[4], [2, 2], [depths[3]] * 2)
        s_out = crop // 32
        self.head = BasicHead(
            [w * 32, w * 32 // beta], num_classes,
            [[num_frames // alpha, s_out, s_out], [num_frames, s_out, s_out]],
        )

    def forward(self, x):
        x = self.s1([t for t in x])
        x = self.s1_fuse(x)
        x = self.s2(x)
        x = self.s2_fuse(x)
        x = self.s3(x)
        x = self.s3_fuse(x)
        x = self.s4(x)
        x = self.s4_fuse(x)
        x = self.s5(x)
        return self.head(x)


# ---------------------------------------------------------------------------
# SlowFastShuffleNetV2
# ---------------------------------------------------------------------------

def _channel_shuffle(x, groups):
    b, c, t, h, w = x.shape
    return (x.view(b, groups, c // groups, t, h, w)
            .permute(0, 2, 1, 3, 4, 5).contiguous().view(b, c, t, h, w))


class InvertedResidual(nn.Module):
    """ShuffleNetV2 unit (reference shufflenetv2_helper.py:46-112)."""

    def __init__(self, inp, oup, stride):
        super().__init__()
        self.stride = stride
        half = oup // 2
        if stride == 1:
            self.banch2 = nn.Sequential(
                nn.Conv3d(half, half, 1, 1, 0, bias=False),
                nn.BatchNorm3d(half), nn.ReLU(),
                nn.Conv3d(half, half, 3, (1, 1, 1), 1, groups=half, bias=False),
                nn.BatchNorm3d(half),
                nn.Conv3d(half, half, 1, 1, 0, bias=False),
                nn.BatchNorm3d(half), nn.ReLU(),
            )
        else:
            self.banch1 = nn.Sequential(
                nn.Conv3d(inp, inp, 3, (1, 2, 2), 1, groups=inp, bias=False),
                nn.BatchNorm3d(inp),
                nn.Conv3d(inp, half, 1, 1, 0, bias=False),
                nn.BatchNorm3d(half), nn.ReLU(),
            )
            self.banch2 = nn.Sequential(
                nn.Conv3d(inp, half, 1, 1, 0, bias=False),
                nn.BatchNorm3d(half), nn.ReLU(),
                nn.Conv3d(half, half, 3, (1, 2, 2), 1, groups=half, bias=False),
                nn.BatchNorm3d(half),
                nn.Conv3d(half, half, 1, 1, 0, bias=False),
                nn.BatchNorm3d(half), nn.ReLU(),
            )

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x[:, :x.shape[1] // 2], x[:, x.shape[1] // 2:]
            out = torch.cat((x1, self.banch2(x2)), 1)
        else:
            out = torch.cat((self.banch1(x), self.banch2(x)), 1)
        return _channel_shuffle(out, 2)


class _SNV2Blocks(nn.Module):
    def __init__(self, inp, oup, repeats):
        super().__init__()
        feats = []
        for i in range(repeats):
            feats.append(InvertedResidual(inp if i == 0 else oup, oup,
                                          2 if i == 0 else 1))
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        return self.features(x)


class SNV2Stage(nn.Module):
    """Two-pathway stage named pathway{p}_channel_{C}
    (reference shufflenetv2_helper.py:222-297)."""

    def __init__(self, inputs, slow_ch, fast_ch, idx, repeats):
        super().__init__()
        self.names = []
        for p, (inp, ch) in enumerate(zip(inputs, (slow_ch, fast_ch))):
            name = f"pathway{p}_channel_{ch[idx + 2]}"
            self.add_module(name, _SNV2Blocks(inp, ch[idx + 2], repeats))
            self.names.append(name)

    def forward(self, x):
        return [getattr(self, n)(xi) for n, xi in zip(self.names, x)]


class SNV2Stem(nn.Module):
    """conv3/s(1,2,2) → BN → ReLU → maxpool3/s(1,2,2)
    (reference stem_helper.py:236-270)."""

    def __init__(self, dims_out):
        super().__init__()
        for p, co in enumerate(dims_out):
            self.add_module(f"pathway{p}_stem", nn.Sequential(
                nn.Conv3d(3, co, 3, (1, 2, 2), (1, 1, 1), bias=False),
                nn.BatchNorm3d(co), nn.ReLU(),
                nn.MaxPool3d(3, (1, 2, 2), 1),
            ))
        self.n = len(dims_out)

    def forward(self, x):
        return [getattr(self, f"pathway{p}_stem")(x[p]) for p in range(self.n)]


class SNV2Head(nn.Module):
    """per-pathway 1x1x1 conv-bn-relu → global avgpool → concat → classifier
    (reference head_helper.py:499-557)."""

    def __init__(self, dims_in, last, num_classes, dropout=0.0):
        super().__init__()
        self.n = len(dims_in)
        for p, (ci, co) in enumerate(zip(dims_in, last)):
            self.add_module(f"pathway{p}_conv1x1x1", nn.Sequential(
                nn.Sequential(nn.Conv3d(ci, co, 1, 1, 0, bias=False),
                              nn.BatchNorm3d(co), nn.ReLU()),
            ))
        self.classifier = nn.Sequential(
            nn.Dropout(dropout), nn.Linear(sum(last), num_classes, bias=True))

    def forward(self, x):
        pooled = []
        for p in range(self.n):
            h = getattr(self, f"pathway{p}_conv1x1x1")(x[p])
            pooled.append(F.avg_pool3d(h, h.shape[-3:]))
        h = torch.cat(pooled, 1).permute(0, 2, 3, 4, 1)
        h = self.classifier(h)
        if not self.training:
            h = torch.softmax(h, dim=4).mean([1, 2, 3])
        return h.view(h.shape[0], -1)


class TorchShuffleNetV2(nn.Module):
    """SlowFastShuffleNetV2 w0.25 (reference :448-617)."""

    def __init__(self, num_classes=6, width_mult=0.25, alpha=4, beta_inv=8):
        super().__init__()
        tables = {0.25: [-1, 24, 32, 64, 128, 1024],
                  0.5: [-1, 24, 48, 96, 192, 1024],
                  1.0: [-1, 24, 116, 240, 464, 1024],
                  1.5: [-1, 24, 176, 352, 704, 1024],
                  2.0: [-1, 24, 224, 496, 976, 2048]}
        slow = tables[width_mult]
        fast = [c // beta_inv if c > 0 else c for c in slow]
        self.s1 = SNV2Stem([slow[1], fast[1]])
        self.s1_fuse = FuseFastAndSlow(slow[1], fast[1], alpha, beta_inv)
        reps = [4, 8, 4]
        self.s2 = SNV2Stage([slow[1] + fast[1], fast[1] + slow[1] // beta_inv],
                            slow, fast, 0, reps[0])
        self.s2_fuse = FuseFastAndSlow(slow[2], fast[2], alpha, beta_inv)
        self.s3 = SNV2Stage([slow[2] + fast[2], fast[2] + slow[2] // beta_inv],
                            slow, fast, 1, reps[1])
        self.s3_fuse = FuseFastAndSlow(slow[3], fast[3], alpha, beta_inv)
        self.s4 = SNV2Stage([slow[3] + fast[3], fast[3] + slow[3] // beta_inv],
                            slow, fast, 2, reps[2])
        self.s4_fuse = FuseFastAndSlow(slow[4], fast[4], alpha, beta_inv)
        self.head = SNV2Head(
            [slow[4] + fast[4], fast[4] + slow[4] // beta_inv],
            [slow[5], fast[5]], num_classes)

    def forward(self, x):
        x = self.s1([t for t in x])
        x = self.s1_fuse(x)
        x = self.s2(x)
        x = self.s2_fuse(x)
        x = self.s3(x)
        x = self.s3_fuse(x)
        x = self.s4(x)
        x = self.s4_fuse(x)
        return self.head(x)
