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

import numpy as np
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


class TorchRoIHead(nn.Module):
    """Detection RoI head (reference head_helper.py:11-130): per-pathway
    temporal avg-pool (squeeze T) → ROIAlign → spatial max-pool → channel
    concat → dropout → linear → activation (applied in train AND eval,
    :126-129). ``roialign`` is injected — the pipeline-parity harness passes
    the reference's OWN compiled ROIAlign_cpu.cpp (tests/roialign_oracle.py),
    so this golden head shares no ROIAlign code with the jax kernel."""

    def __init__(self, dims_in, num_classes, roialign, resolution=7,
                 scale_factor=16, aligned=True, dropout=0.0):
        super().__init__()
        self.roialign = roialign
        self.resolution = resolution
        self.scale_factor = scale_factor
        self.aligned = aligned
        if dropout > 0.0:
            self.dropout = nn.Dropout(dropout)
        self.projection = nn.Linear(sum(dims_in), num_classes, bias=True)
        self.act = nn.Sigmoid()

    def forward(self, x, bboxes):
        pooled = []
        for xi in x:
            feat = xi.mean(dim=2)  # NCTHW → NCHW (temporal avg over full T)
            roi = self.roialign(
                feat.detach().numpy().transpose(0, 2, 3, 1),
                np.asarray(bboxes, np.float32), self.resolution,
                1.0 / self.scale_factor, 0, self.aligned)  # (R, out, out, C)
            roi = torch.from_numpy(
                np.ascontiguousarray(roi.transpose(0, 3, 1, 2)))
            pooled.append(roi.amax(dim=(2, 3)))           # (R, C)
        h = torch.cat(pooled, 1)
        if hasattr(self, "dropout"):
            h = self.dropout(h)
        h = self.projection(h)
        return self.act(h).view(h.shape[0], -1)


class TorchSlowFastDetection(TorchSlowFast):
    """TorchSlowFast trunk + RoI detection head (AVA); forward takes
    (pathways, bboxes(R,5) [batch_idx, x1, y1, x2, y2] in input pixels)."""

    def __init__(self, roialign, num_classes=80, width=8, alpha=4,
                 beta_inv=8, fusion_ratio=2, fusion_kernel=5, num_frames=8,
                 crop=32, depths=(2, 2, 2, 2), resolution=7,
                 scale_factor=16, aligned=True):
        super().__init__(num_classes=num_classes, width=width, alpha=alpha,
                         beta_inv=beta_inv, fusion_ratio=fusion_ratio,
                         fusion_kernel=fusion_kernel, num_frames=num_frames,
                         crop=crop, depths=depths)
        w, beta = width, beta_inv
        self.head = TorchRoIHead(
            [w * 32, w * 32 // beta], num_classes, roialign,
            resolution=resolution, scale_factor=scale_factor,
            aligned=aligned)

    def forward(self, x, bboxes):
        x = self.s1([t for t in x])
        x = self.s1_fuse(x)
        x = self.s2(x)
        x = self.s2_fuse(x)
        x = self.s3(x)
        x = self.s3_fuse(x)
        x = self.s4(x)
        x = self.s4_fuse(x)
        x = self.s5(x)
        return self.head(x, bboxes)


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


# ---------------------------------------------------------------------------
# SlowFastMoibleNetV2
# ---------------------------------------------------------------------------

class _MBConv(nn.Module):
    """MobileNetV2 inverted residual with a `.conv` Sequential
    (reference mobilenetv2_helper.py:30-68)."""

    def __init__(self, inp, oup, stride, expand):
        super().__init__()
        hidden = round(inp * expand)
        self.use_res = stride == (1, 1, 1) and inp == oup
        if expand == 1:
            self.conv = nn.Sequential(
                nn.Conv3d(hidden, hidden, 3, stride, 1, groups=hidden,
                          bias=False),
                nn.BatchNorm3d(hidden), nn.ReLU6(),
                nn.Conv3d(hidden, oup, 1, 1, 0, bias=False),
                nn.BatchNorm3d(oup))
        else:
            self.conv = nn.Sequential(
                nn.Conv3d(inp, hidden, 1, 1, 0, bias=False),
                nn.BatchNorm3d(hidden), nn.ReLU6(),
                nn.Conv3d(hidden, hidden, 3, stride, 1, groups=hidden,
                          bias=False),
                nn.BatchNorm3d(hidden), nn.ReLU6(),
                nn.Conv3d(hidden, oup, 1, 1, 0, bias=False),
                nn.BatchNorm3d(oup))

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class _MBBlocks(nn.Module):
    def __init__(self, blocks):
        super().__init__()
        self.features = nn.Sequential(*blocks)

    def forward(self, x):
        return self.features(x)


class MBStage(nn.Module):
    """Two-pathway stage named pathway{p}_channel_{c_raw}
    (reference mobilenetv2_helper.py:258-345)."""

    def __init__(self, inputs, rows, width_mult, beta_inv):
        super().__init__()
        self.names = []
        for p, inp in enumerate(inputs):
            blocks = []
            cin = inp
            for t_, c, n, s in rows:
                cout = (int(c * width_mult) if p == 0
                        else int(c * width_mult // beta_inv))
                for i in range(n):
                    blocks.append(_MBConv(cin, cout,
                                          tuple(s) if i == 0 else (1, 1, 1),
                                          t_))
                    cin = cout
            name = f"pathway{p}_channel_{rows[0][1]}"
            self.add_module(name, _MBBlocks(blocks))
            self.names.append(name)
        self.out_channels = [
            (int(rows[-1][1] * width_mult) if p == 0
             else int(rows[-1][1] * width_mult // beta_inv))
            for p in range(len(inputs))
        ]

    def forward(self, x):
        return [getattr(self, n)(xi) for n, xi in zip(self.names, x)]


class _MBStem(nn.Module):
    def __init__(self, co):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv3d(3, co, 3, (1, 2, 2), 1, bias=False),
            nn.BatchNorm3d(co), nn.ReLU6())

    def forward(self, x):
        return self.features(x)


class MBStem(nn.Module):
    """conv_bn 3x3x3/s(1,2,2) + ReLU6 per pathway
    (reference stem_helper.py:181-232)."""

    def __init__(self, dims_out):
        super().__init__()
        for p, co in enumerate(dims_out):
            self.add_module(f"pathway{p}_stem", _MBStem(co))
        self.n = len(dims_out)

    def forward(self, x):
        return [getattr(self, f"pathway{p}_stem")(x[p]) for p in range(self.n)]


class MBHead(nn.Module):
    """per-pathway conv1x1x1+BN+ReLU6 → global avgpool → concat → classifier
    (reference head_helper.py:436-486)."""

    def __init__(self, dims_in, last, num_classes, dropout=0.0):
        super().__init__()
        self.n = len(dims_in)
        for p, (ci, co) in enumerate(zip(dims_in, last)):
            self.add_module(f"pathway{p}_conv1x1x1", nn.Sequential(
                nn.Conv3d(ci, co, 1, 1, 0, bias=False),
                nn.BatchNorm3d(co), nn.ReLU6()))
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


class TorchMobileNetV2(nn.Module):
    """SlowFastMoibleNetV2 (reference custom_video_model_builder.py:1057-1285;
    stage layout per forward :1262-1285: s2=rows[0:2], s4=rows[2:3],
    s5=rows[3:4], s6=rows[4:5], s7=rows[5:6], s8=rows[6:], CMDA fuse after
    s2/s4/s5/s7)."""

    SETTINGS = [(1, 16, 1, (1, 1, 1)), (6, 24, 2, (1, 2, 2)),
                (6, 32, 3, (1, 2, 2)), (6, 64, 4, (1, 2, 2)),
                (6, 96, 3, (1, 1, 1)), (6, 160, 3, (1, 2, 2)),
                (6, 320, 1, (1, 1, 1))]

    def __init__(self, num_classes=6, width_mult=1.0, alpha=4, beta_inv=8):
        super().__init__()
        wm, beta = width_mult, beta_inv
        rows = self.SETTINGS
        cs = [int(32 * wm), int(32 * (wm / beta))]
        self.s1 = MBStem(cs)

        def mkstage(name, rws, cin):
            st = MBStage(cin, rws, wm, beta)
            self.add_module(name, st)
            return st.out_channels

        def mkfuse(name, ch):
            self.add_module(name, FuseFastAndSlow(ch[0], ch[1], alpha, beta))
            return [ch[0] + ch[1], ch[1] + ch[0] // beta]

        ch = mkstage("s2", rows[0:2], cs)
        ch = mkfuse("s3_fuse", ch)
        ch = mkstage("s4", rows[2:3], ch)
        ch = mkfuse("s4_fuse", ch)
        ch = mkstage("s5", rows[3:4], ch)
        ch = mkfuse("s5_fuse", ch)
        ch = mkstage("s6", rows[4:5], ch)
        ch = mkstage("s7", rows[5:6], ch)
        ch = mkfuse("s7_fuse", ch)
        ch = mkstage("s8", rows[6:], ch)
        last = int(1280 * wm) if wm > 1.0 else 1280
        self.head = MBHead(ch, [last, last // beta], num_classes)

    def forward(self, x):
        x = self.s1([t for t in x])
        x = self.s2(x)
        x = self.s3_fuse(x)
        x = self.s4(x)
        x = self.s4_fuse(x)
        x = self.s5(x)
        x = self.s5_fuse(x)
        x = self.s6(x)
        x = self.s7(x)
        x = self.s7_fuse(x)
        x = self.s8(x)
        return self.head(x)


# ---------------------------------------------------------------------------
# SlowFastShuffleNet (grouped v1)
# ---------------------------------------------------------------------------

class _SNBottleneck(nn.Module):
    """Grouped 1x1 bottleneck + channel shuffle + avgpool shortcut
    (reference shufflenet_helper.py:37-85)."""

    def __init__(self, inp, oup, stride, groups):
        super().__init__()
        self.stride = stride
        self.groups = groups
        mid = oup // 2 if stride == 2 else oup // 4
        out_c = oup - oup // 2 if stride == 2 else oup
        g = 1 if inp == 24 else groups
        self.conv1 = nn.Conv3d(inp, mid, 1, groups=g, bias=False)
        self.bn1 = nn.BatchNorm3d(mid)
        self.conv2 = nn.Conv3d(mid, mid, 3, (1, stride, stride), 1,
                               groups=mid, bias=False)
        self.bn2 = nn.BatchNorm3d(mid)
        self.conv3 = nn.Conv3d(mid, out_c, 1, groups=groups, bias=False)
        self.bn3 = nn.BatchNorm3d(out_c)
        if stride == 2:
            self.shortcut = nn.Sequential(
                nn.Conv3d(inp, mid, 1, bias=False),
                nn.AvgPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)))

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = _channel_shuffle(y, self.groups)
        y = self.bn2(self.conv2(y))
        y = self.bn3(self.conv3(y))
        if self.stride == 2:
            return F.relu(torch.cat([y, self.shortcut(x)], 1))
        return F.relu(y + x)


class _SNBlocks(nn.Module):
    def __init__(self, blocks):
        super().__init__()
        self.features = nn.Sequential(*blocks)

    def forward(self, x):
        return self.features(x)


class SNStage(nn.Module):
    def __init__(self, inputs, outs, repeats, groups):
        super().__init__()
        self.names = []
        for p, (inp, oup) in enumerate(zip(inputs, outs)):
            blocks = []
            cin = inp
            for i in range(repeats):
                blocks.append(_SNBottleneck(cin, oup, 2 if i == 0 else 1,
                                            groups))
                cin = oup
            name = f"pathway{p}_channel_{oup}"
            self.add_module(name, _SNBlocks(blocks))
            self.names.append(name)

    def forward(self, x):
        return [getattr(self, n)(xi) for n, xi in zip(self.names, x)]


class SNHead(nn.Module):
    """pool + concat + classifier, no pre-conv (reference
    head_helper.py:562-609)."""

    def __init__(self, dims_in, num_classes, dropout=0.0):
        super().__init__()
        self.n = len(dims_in)
        self.classifier = nn.Sequential(
            nn.Dropout(dropout),
            nn.Linear(sum(dims_in), num_classes, bias=True))

    def forward(self, x):
        pooled = [F.avg_pool3d(x[p], x[p].shape[-3:]) for p in range(self.n)]
        h = torch.cat(pooled, 1).permute(0, 2, 3, 4, 1)
        h = self.classifier(h)
        if not self.training:
            h = torch.softmax(h, dim=4).mean([1, 2, 3])
        return h.view(h.shape[0], -1)


class TorchShuffleNet(nn.Module):
    """SlowFastShuffleNet (reference custom_video_model_builder.py:620-789;
    out_planes table :646-661; CMDA fuse after s1 and every stage)."""

    TABLES = {1: [24, 144, 288, 567], 2: [24, 200, 400, 800],
              3: [24, 240, 480, 960], 4: [24, 272, 544, 1088],
              8: [24, 384, 768, 1536]}

    def __init__(self, num_classes=6, width_mult=1.0, groups=3, alpha=4,
                 beta_inv=8):
        super().__init__()
        slow = [int(c * width_mult) for c in self.TABLES[groups]]
        fast = [c // beta_inv for c in slow]
        self.s1 = SNV2Stem([slow[0], fast[0]])  # same conv/bn/relu/maxpool stem
        self.s1_fuse = FuseFastAndSlow(slow[0], fast[0], alpha, beta_inv)
        ch = [slow[0] + fast[0], fast[0] + slow[0] // beta_inv]
        reps = [4, 8, 4]
        for i, name in enumerate(("s2", "s3", "s4")):
            outs = [slow[i + 1], fast[i + 1]]
            self.add_module(name, SNStage(ch, outs, reps[i], groups))
            self.add_module(f"{name}_fuse",
                            FuseFastAndSlow(outs[0], outs[1], alpha, beta_inv))
            ch = [outs[0] + outs[1], outs[1] + outs[0] // beta_inv]
        self.head = SNHead(ch, num_classes)

    def forward(self, x):
        x = self.s1([t for t in x])
        x = self.s1_fuse(x)
        for name in ("s2", "s3", "s4"):
            x = getattr(self, name)(x)
            x = getattr(self, f"{name}_fuse")(x)
        return self.head(x)


# ---------------------------------------------------------------------------
# SlowFastGhostNet
# ---------------------------------------------------------------------------

def _make_divisible(v, divisor=4, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _GhostSE(nn.Module):
    def __init__(self, in_chs, se_ratio=0.25):
        super().__init__()
        red = _make_divisible(in_chs * se_ratio, 4)
        self.conv_reduce = nn.Conv3d(in_chs, red, 1, bias=True)
        self.conv_expand = nn.Conv3d(red, in_chs, 1, bias=True)

    def forward(self, x):
        y = x.mean((-3, -2, -1), keepdim=True)
        y = F.relu(self.conv_reduce(y))
        y = self.conv_expand(y)
        return x * (F.relu6(y + 3.0) / 6.0)


class _GhostModule(nn.Module):
    def __init__(self, inp, oup, kernel_size=1, ratio=2, dw_size=3,
                 stride=1, relu=True):
        super().__init__()
        import math as _math

        self.oup = oup
        init_c = _math.ceil(oup / ratio)
        new_c = init_c * (ratio - 1)
        self.primary_conv = nn.Sequential(
            nn.Conv3d(inp, init_c, (1, kernel_size, kernel_size),
                      (1, stride, stride),
                      (0, kernel_size // 2, kernel_size // 2), bias=False),
            nn.BatchNorm3d(init_c),
            nn.ReLU() if relu else nn.Identity())
        self.cheap_operation = nn.Sequential(
            nn.Conv3d(init_c, new_c, dw_size, 1, dw_size // 2,
                      groups=init_c, bias=False),
            nn.BatchNorm3d(new_c),
            nn.ReLU() if relu else nn.Identity())

    def forward(self, x):
        x1 = self.primary_conv(x)
        x2 = self.cheap_operation(x1)
        return torch.cat([x1, x2], 1)[:, : self.oup]


class _GhostBottleneck(nn.Module):
    def __init__(self, inp, mid, oup, k, stride, se_ratio):
        super().__init__()
        self.stride = stride
        self.ghost1 = _GhostModule(inp, mid, relu=True)
        if stride > 1:
            self.conv_dw = nn.Conv3d(mid, mid, (1, k, k), (1, stride, stride),
                                     (0, (k - 1) // 2, (k - 1) // 2),
                                     groups=mid, bias=False)
            self.bn_dw = nn.BatchNorm3d(mid)
        self.se = _GhostSE(mid, se_ratio) if se_ratio > 0 else None
        self.ghost2 = _GhostModule(mid, oup, relu=False)
        if inp == oup and stride == 1:
            self.shortcut = None
        else:
            self.shortcut = nn.Sequential(
                nn.Conv3d(inp, inp, (1, k, k), (1, stride, stride),
                          (0, (k - 1) // 2, (k - 1) // 2), groups=inp,
                          bias=False),
                nn.BatchNorm3d(inp),
                nn.Conv3d(inp, oup, 1, 1, 0, bias=False),
                nn.BatchNorm3d(oup))

    def forward(self, x):
        y = self.ghost1(x)
        if self.stride > 1:
            y = self.bn_dw(self.conv_dw(y))
        if self.se is not None:
            y = self.se(y)
        y = self.ghost2(y)
        sc = x if self.shortcut is None else self.shortcut(x)
        return y + sc


class _GhostBlocks(nn.Module):
    def __init__(self, blocks):
        super().__init__()
        self.features = nn.Sequential(*blocks)

    def forward(self, x):
        return self.features(x)


class GhostStage(nn.Module):
    def __init__(self, inputs, slow_rows, fast_rows):
        super().__init__()
        self.names = []
        for p, (inp, rows) in enumerate(zip(inputs, (slow_rows, fast_rows))):
            blocks = []
            cin = inp
            for k, mid, c, se, s in rows:
                blocks.append(_GhostBottleneck(cin, mid, c, int(k), int(s),
                                               float(se)))
                cin = c
            name = f"pathway{p}_channel_{rows[-1][2]}"
            self.add_module(name, _GhostBlocks(blocks))
            self.names.append(name)

    def forward(self, x):
        return [getattr(self, n)(xi) for n, xi in zip(self.names, x)]


class _GhostHeadConv(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.conv = nn.Conv3d(ci, co, 1, 1, 0, bias=False)
        self.bn1 = nn.BatchNorm3d(co)

    def forward(self, x):
        return F.relu(self.bn1(self.conv(x)))


class GhostHead(nn.Module):
    """stage5 conv → pool → conv_head → ReLU → concat → classifier; the
    reference overwrites the eval activation with ReLU
    (head_helper.py:665) — reproduced."""

    def __init__(self, mids_in, mids, outs, num_classes, dropout=0.0):
        super().__init__()
        self.stage5_conv_slow = _GhostHeadConv(mids_in[0], mids[0])
        self.stage5_conv_fast = _GhostHeadConv(mids_in[1], mids[1])
        self.conv_head_slow = nn.Conv3d(mids[0], outs[0], 1, bias=True)
        self.conv_head_fast = nn.Conv3d(mids[1], outs[1], 1, bias=True)
        self.classifier = nn.Sequential(
            nn.Dropout(dropout), nn.Linear(sum(outs), num_classes, bias=True))

    def forward(self, x):
        pooled = []
        for p, (s5, ch) in enumerate((
                (self.stage5_conv_slow, self.conv_head_slow),
                (self.stage5_conv_fast, self.conv_head_fast))):
            h = s5(x[p])
            h = F.avg_pool3d(h, h.shape[-3:])
            pooled.append(F.relu(ch(h)))
        h = torch.cat(pooled, 1).permute(0, 2, 3, 4, 1)
        h = self.classifier(h)
        if not self.training:
            h = F.relu(h).mean([1, 2, 3])
        return h.view(h.shape[0], -1)


class TorchGhostNet(nn.Module):
    """SlowFastGhostNet (reference custom_video_model_builder.py:792-1026;
    stage cfgs :814-844, CMDA fuse after s1..s4)."""

    CFGS = [
        [[3, 16, 16, 0, 1]],
        [[3, 48, 24, 0, 2], [3, 72, 24, 0, 1]],
        [[5, 72, 40, 0.25, 2], [5, 120, 40, 0.25, 1]],
        [[3, 240, 80, 0, 2], [3, 200, 80, 0, 1], [3, 184, 80, 0, 1],
         [3, 184, 80, 0, 1], [3, 480, 112, 0.25, 1], [3, 672, 112, 0.25, 1]],
        [[5, 672, 160, 0.25, 2], [5, 960, 160, 0, 1], [5, 960, 160, 0.25, 1],
         [5, 960, 160, 0, 1], [5, 960, 160, 0.25, 1]],
    ]

    def __init__(self, num_classes=6, width_mult=1.0, alpha=4, beta_inv=8):
        super().__init__()
        wm, beta = width_mult, beta_inv
        md = _make_divisible
        slow_cfgs = [[[k, md(t * wm, 4), md(c * wm, 4), se, s]
                      for k, t, c, se, s in rows] for rows in self.CFGS]
        fast_cfgs = [[[k, md(t * wm // beta, 4), md(c * wm // beta, 4), se, s]
                      for k, t, c, se, s in rows] for rows in self.CFGS]
        stem = [md(16 * wm, 4), md(16 * wm // beta, 4)]
        self.s0 = SNV2StemNoPool(stem)
        ch = stem
        for i in range(5):
            self.add_module(f"s{i + 1}",
                            GhostStage(ch, slow_cfgs[i], fast_cfgs[i]))
            ch = [slow_cfgs[i][-1][2], fast_cfgs[i][-1][2]]
            if i < 4:
                self.add_module(f"s{i + 1}_fuse",
                                FuseFastAndSlow(ch[0], ch[1], alpha, beta))
                ch = [ch[0] + ch[1], ch[1] + ch[0] // beta]
        outs = [int(1280 * wm), int(1280 * wm // beta)]
        self.head = GhostHead(ch, [slow_cfgs[4][-1][1], fast_cfgs[4][-1][1]],
                              outs, num_classes)

    def forward(self, x):
        x = self.s0([t for t in x])
        for i in range(5):
            x = getattr(self, f"s{i + 1}")(x)
            if i < 4:
                x = getattr(self, f"s{i + 1}_fuse")(x)
        return self.head(x)


class SNV2StemNoPool(nn.Module):
    """conv3/s(1,2,2)+BN+ReLU, no pool (reference stem_helper.py:309-336)."""

    def __init__(self, dims_out):
        super().__init__()
        for p, co in enumerate(dims_out):
            self.add_module(f"pathway{p}_stem", nn.Sequential(
                nn.Conv3d(3, co, 3, (1, 2, 2), (1, 1, 1), bias=False),
                nn.BatchNorm3d(co), nn.ReLU()))
        self.n = len(dims_out)

    def forward(self, x):
        return [getattr(self, f"pathway{p}_stem")(x[p]) for p in range(self.n)]


# ---------------------------------------------------------------------------
# Single-pathway ResNet ("slow" arch)
# ---------------------------------------------------------------------------

class TorchSlowR18(nn.Module):
    """Single-pathway Slow R18 (reference video_model_builder.py:419-611;
    slow basis: tk [[1],[1],[1],[3],[3]], pool1 [1,1,1])."""

    def __init__(self, num_classes=6, width=8, num_frames=4, crop=32,
                 depths=(2, 2, 2, 2)):
        super().__init__()
        w = width
        tk = [1, 1, 1, 3, 3]
        self.s1 = PathwayStems([3], [w], [tk[0]])
        self.s2 = ResStage([w], [w * 4], [tk[1]], [1], [depths[0]])
        self.s3 = ResStage([w * 4], [w * 8], [tk[2]], [2], [depths[1]])
        self.s4 = ResStage([w * 8], [w * 16], [tk[3]], [2], [depths[2]])
        self.s5 = ResStage([w * 16], [w * 32], [tk[4]], [2], [depths[3]])
        s_out = crop // 32
        self.head = BasicHead([w * 32], num_classes,
                              [[num_frames, s_out, s_out]])

    def forward(self, x):
        x = self.s1([t for t in x])
        x = self.s2(x)
        x = self.s3(x)
        x = self.s4(x)
        x = self.s5(x)
        return self.head(x)


# ---------------------------------------------------------------------------
# Non-local (I3D-NLN / SLOW-NLN family)
# ---------------------------------------------------------------------------

class TorchNonlocal(nn.Module):
    """Reference nonlocal_helper.py:10-148: theta/phi/g 1x1x1 convs,
    softmax(d^-0.5) or dot_product affinity, optional maxpool on phi/g,
    conv_out + zero-init BN residual."""

    def __init__(self, dim, dim_inner, pool_size=None,
                 instantiation="softmax"):
        super().__init__()
        self.dim_inner = dim_inner
        self.instantiation = instantiation
        self.conv_theta = nn.Conv3d(dim, dim_inner, 1)
        self.conv_phi = nn.Conv3d(dim, dim_inner, 1)
        self.conv_g = nn.Conv3d(dim, dim_inner, 1)
        self.conv_out = nn.Conv3d(dim_inner, dim, 1)
        self.bn = nn.BatchNorm3d(dim)
        if pool_size is not None and any(s > 1 for s in pool_size):
            self.pool = nn.MaxPool3d(tuple(pool_size), tuple(pool_size))
        else:
            self.pool = None

    def forward(self, x):
        b, c, t, h, w = x.shape
        identity = x
        theta = self.conv_theta(x)
        xp = self.pool(x) if self.pool is not None else x
        phi = self.conv_phi(xp)
        g = self.conv_g(xp)
        theta = theta.view(b, self.dim_inner, -1)
        phi = phi.view(b, self.dim_inner, -1)
        g = g.view(b, self.dim_inner, -1)
        aff = torch.einsum("bdq,bdk->bqk", theta, phi)
        if self.instantiation == "softmax":
            aff = torch.softmax(aff * self.dim_inner ** -0.5, dim=-1)
        else:
            aff = aff / aff.shape[-1]
        out = torch.einsum("bqk,bdk->bdq", aff, g).view(b, self.dim_inner,
                                                        t, h, w)
        return identity + self.bn(self.conv_out(out))


class ResStageNLN(ResStage):
    """Single-pathway ResStage with non-local blocks inserted after the
    listed block indices (reference resnet_helper.py:530-561)."""

    def __init__(self, dims_in, dims_out, t_kernels, strides, num_blocks,
                 nln_inds, pool_size, instantiation="softmax"):
        super().__init__(dims_in, dims_out, t_kernels, strides, num_blocks)
        self.nln_inds = nln_inds
        for i in nln_inds:
            self.add_module(
                f"pathway0_nonlocal{i}",
                TorchNonlocal(dims_out[0], dims_out[0] // 2, pool_size,
                              instantiation))

    def forward(self, x):
        h = x[0]
        for i in range(self.num_blocks[0]):
            h = getattr(self, f"pathway0_res{i}")(h)
            if i in self.nln_inds:
                h = getattr(self, f"pathway0_nonlocal{i}")(h)
        return [h]


class TorchSlowNLN(nn.Module):
    """Slow R18 with a non-local block in s3 (the NLN zoo pattern)."""

    def __init__(self, num_classes=6, width=8, num_frames=4, crop=32,
                 instantiation="softmax"):
        super().__init__()
        w = width
        self.s1 = PathwayStems([3], [w], [1])
        self.s2 = ResStage([w], [w * 4], [1], [1], [2])
        self.s3 = ResStageNLN([w * 4], [w * 8], [1], [2], [2],
                              nln_inds=[1], pool_size=[1, 2, 2],
                              instantiation=instantiation)
        self.s4 = ResStage([w * 8], [w * 16], [3], [2], [2])
        self.s5 = ResStage([w * 16], [w * 32], [3], [2], [2])
        s_out = crop // 32
        self.head = BasicHead([w * 32], num_classes,
                              [[num_frames, s_out, s_out]])

    def forward(self, x):
        x = self.s1([t for t in x])
        x = self.s2(x)
        x = self.s3(x)
        x = self.s4(x)
        x = self.s5(x)
        return self.head(x)


# ---------------------------------------------------------------------------
# Reference COMPOSED test-time preprocessing, transcribed for the
# cross-pipeline parity harness (tests/test_pipeline_parity.py).
# Sources: slowfast/datasets/kinetics.py:122-255 (__getitem__ order:
# tensor_normalize -> THWC->CTHW permute -> spatial_sampling ->
# pack_pathway_output), slowfast/datasets/utils.py:73-203,298-317,
# slowfast/datasets/transform.py:283-337 (short-side resize) and :425-468
# (uniform_crop).
# ---------------------------------------------------------------------------

def reference_tensor_normalize(t, mean, std):
    """utils.py:298-317 — uint8 -> float/255, then -mean, /std (last dim)."""
    if t.dtype == torch.uint8:
        t = t.float() / 255.0
    return (t - torch.tensor(mean)) / torch.tensor(std)


def reference_short_side_resize(images, size):
    """transform.py:283-337 with min==max==size (deterministic test branch):
    no-op when the short side already equals size, else bilinear interpolate
    (align_corners=False) with floor'ed long side."""
    import math

    height, width = images.shape[2], images.shape[3]
    if (width <= height and width == size) or (
            height <= width and height == size):
        return images
    new_width = new_height = size
    if width < height:
        new_height = int(math.floor((float(height) / width) * size))
    else:
        new_width = int(math.floor((float(width) / height) * size))
    return torch.nn.functional.interpolate(
        images, size=(new_height, new_width), mode="bilinear",
        align_corners=False)


def reference_uniform_crop(images, size, spatial_idx):
    """transform.py:425-468 — 3-position crop with ceil'ed center offsets."""
    import math

    assert spatial_idx in (0, 1, 2)
    height, width = images.shape[2], images.shape[3]
    y_offset = int(math.ceil((height - size) / 2))
    x_offset = int(math.ceil((width - size) / 2))
    if height > width:
        if spatial_idx == 0:
            y_offset = 0
        elif spatial_idx == 2:
            y_offset = height - size
    else:
        if spatial_idx == 0:
            x_offset = 0
        elif spatial_idx == 2:
            x_offset = width - size
    return images[:, :, y_offset:y_offset + size, x_offset:x_offset + size]


def reference_pack_pathway(frames, alpha):
    """utils.py:73-112 — slow = linspace index_select of every alpha-th
    frame along T (frames are CTHW)."""
    fast = frames
    slow = torch.index_select(
        frames, 1,
        torch.linspace(0, frames.shape[1] - 1,
                       frames.shape[1] // alpha).long())
    return [slow, fast]


def reference_test_views(frames_thwc_uint8, spatial_idx, crop, mean, std,
                         alpha):
    """The reference's full composed test-mode chain for one clip
    (kinetics.py:122-255 with min=max=crop): returns [slow, fast] CTHW
    float tensors with a leading batch dim of 1."""
    t = torch.from_numpy(np.ascontiguousarray(frames_thwc_uint8))
    t = reference_tensor_normalize(t, mean, std)
    t = t.permute(3, 0, 1, 2)  # THWC -> CTHW
    t = reference_short_side_resize(t, crop)
    t = reference_uniform_crop(t, crop, spatial_idx)
    return [p.unsqueeze(0) for p in reference_pack_pathway(t, alpha)]
