"""Inference-only torch mirror of KP2DTinyV2/V3 for ONNX export.

The reference's export contract is an ONNX file produced by
`torch.onnx.export` over the raw model forward
(/root/reference/export_onnx.py:70-79: opset 16, input "image"
(1, 3, H, W), outputs score/coord/desc/vlad/seg). The native export path
here is StableHLO / TF SavedModel (export.py), but ONNX is what MCU/edge
toolchains consume — and this environment has no jax->ONNX route
(tf2onnx/onnx not installed, no egress). torch (CPU) IS installed, and
its TorchScript ONNX exporter serializes the ModelProto natively in C++,
so a torch twin of OUR flax architecture closes the contract without any
new dependency.

This module is that twin: NCHW torch modules mirroring each flax module
in nanovs_slam_tpu/modules (same math, same quirks — eps-outside-sqrt
channel LayerNorm, no-residual SegFormer blocks, torch-convention
pixel shuffle), plus a direct flax->torch weight loader (HWIO -> OIHW,
BN scale/bias/mean/var). Parity is enforced by tests/test_torch_mirror.py:
mirror forward == flax forward on random-init weights for V2/V3, plain
and attention, pixelshuffle and MCU-convtranspose, netvlad/gem/convap.

The only wrinkle: torch's exporter post-processes the serialized proto
through `_add_onnxscript_fn`, which imports the `onnx` package but is a
no-op unless custom onnxscript functions are present (none are — this is
a plain conv net). `export_onnx` patches it to the identity when `onnx`
is unavailable.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np
import torch
import torch.nn as nn

from ..configs import KP2DTinyConfig


# ---------------------------------------------------------------------------
# loaders: flax subtree -> torch tensors
# ---------------------------------------------------------------------------

def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, np.float32).copy())


def _conv_w(kernel) -> torch.Tensor:
    """flax HWIO -> torch OIHW (utils/torch_export._inv_conv_kernel)."""
    return _t(kernel).permute(3, 2, 0, 1).contiguous()


def _tconv_w(kernel) -> torch.Tensor:
    """flax (kH, kW, O, I) transpose-kernel -> torch ConvTranspose2d
    (I, O, kH, kW) (utils/torch_export._inv_tconv_kernel inverse)."""
    return _t(kernel).permute(3, 2, 0, 1).contiguous()


def l2n(x: torch.Tensor, dim: int, eps: float = 1e-12) -> torch.Tensor:
    """Exact twin of modules/blocks.l2_normalize: x / max(sqrt(sum(x^2)
    + eps^2), eps)."""
    norm = torch.sqrt((x * x).sum(dim=dim, keepdim=True) + eps * eps)
    return x / torch.clamp(norm, min=eps)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

class TConvBNAct(nn.Module):
    """modules/blocks.ConvBNAct: 3x3 conv (no bias) + BN + (Leaky)ReLU."""

    def __init__(self, c_in: int, c_out: int, leaky: bool = True):
        super().__init__()
        self.conv = nn.Conv2d(c_in, c_out, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(c_out, eps=1e-5, momentum=0.1)
        self.act = nn.LeakyReLU(0.01) if leaky else nn.ReLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))

    def load_flax(self, p: Mapping, bs: Mapping):
        self.conv.weight.data = _conv_w(p["conv"]["kernel"])
        self.bn.weight.data = _t(p["bn"]["scale"])
        self.bn.bias.data = _t(p["bn"]["bias"])
        self.bn.running_mean.data = _t(bs["bn"]["mean"])
        self.bn.running_var.data = _t(bs["bn"]["var"])


class TUpsampler(nn.Module):
    """modules/blocks.Upsampler: PixelShuffle(2) or
    ConvTranspose(c -> c//4, k3 s2 p1 op1) + BN + act (MCU path)."""

    def __init__(self, c_in: int, method: str, leaky: bool = True):
        super().__init__()
        self.method = method
        if method == "pixelshuffle":
            self.shuffle = nn.PixelShuffle(2)
        else:
            self.transposed_conv = nn.ConvTranspose2d(
                c_in, c_in // 4, 3, stride=2, padding=1, output_padding=1,
                bias=False)
            self.bn = nn.BatchNorm2d(c_in // 4, eps=1e-5, momentum=0.1)
            self.act = nn.LeakyReLU(0.01) if leaky else nn.ReLU()

    def forward(self, x):
        if self.method == "pixelshuffle":
            return self.shuffle(x)
        return self.act(self.bn(self.transposed_conv(x)))

    def load_flax(self, p: Mapping, bs: Mapping):
        if self.method == "pixelshuffle":
            return
        self.transposed_conv.weight.data = _tconv_w(
            p["transposed_conv"]["kernel"])
        self.bn.weight.data = _t(p["bn"]["scale"])
        self.bn.bias.data = _t(p["bn"]["bias"])
        self.bn.running_mean.data = _t(bs["bn"]["mean"])
        self.bn.running_var.data = _t(bs["bn"]["var"])


def _load_conv(conv: nn.Conv2d, p: Mapping):
    conv.weight.data = _conv_w(p["kernel"])
    if conv.bias is not None:
        conv.bias.data = _t(p["bias"])


# ---------------------------------------------------------------------------
# attention (modules/attention.py)
# ---------------------------------------------------------------------------

class TChannelLayerNorm(nn.Module):
    """(x - mean) / (sqrt(biased_var) + eps) * g + b over channels."""

    def __init__(self, dim: int, eps: float = 1e-5):
        super().__init__()
        self.g = nn.Parameter(torch.ones(1, dim, 1, 1))
        self.b = nn.Parameter(torch.zeros(1, dim, 1, 1))
        self.eps = eps

    def forward(self, x):
        mean = x.mean(dim=1, keepdim=True)
        var = x.var(dim=1, keepdim=True, unbiased=False)
        return (x - mean) / (torch.sqrt(var) + self.eps) * self.g + self.b

    def load_flax(self, p: Mapping):
        self.g.data = _t(p["g"]).view(1, -1, 1, 1)
        self.b.data = _t(p["b"]).view(1, -1, 1, 1)


class TEfficientSelfAttention(nn.Module):
    def __init__(self, dim: int, heads: int = 4, reduction_ratio: int = 2):
        super().__init__()
        self.heads, self.r = heads, reduction_ratio
        self.to_q = nn.Conv2d(dim, dim, 1, bias=False)
        self.to_kv = nn.Conv2d(dim, 2 * dim, reduction_ratio,
                               stride=reduction_ratio, bias=False)
        self.to_out = nn.Conv2d(dim, dim, 1, bias=False)

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.heads
        dh = C // h
        scale = dh ** -0.5
        q = self.to_q(x)
        kv = self.to_kv(x)
        k, v = kv[:, :C], kv[:, C:]

        def to_heads(t):
            # NCHW -> (B, N, C) -> (B, h, N, dh); the (B, N, h, dh) split
            # is head-major over channels, matching the flax reshape
            B_, C_, H_, W_ = t.shape
            t = t.flatten(2).permute(0, 2, 1)
            return t.reshape(B_, H_ * W_, h, dh).permute(0, 2, 1, 3)

        qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
        sim = torch.matmul(qh, kh.transpose(-1, -2)) * scale
        attn = torch.softmax(sim, dim=-1)
        out = torch.matmul(attn, vh)  # (B, h, N, dh)
        out = out.permute(0, 2, 1, 3).reshape(B, H * W, C)
        out = out.permute(0, 2, 1).reshape(B, C, H, W)
        return self.to_out(out)

    def load_flax(self, p: Mapping):
        self.to_q.weight.data = _conv_w(p["to_q"]["kernel"])
        self.to_kv.weight.data = _conv_w(p["to_kv"]["kernel"])
        self.to_out.weight.data = _conv_w(p["to_out"]["kernel"])


class TMixFeedForward(nn.Module):
    def __init__(self, dim: int, expansion: int = 2):
        super().__init__()
        hidden = dim * expansion
        self.expand = nn.Conv2d(dim, hidden, 1, bias=True)
        self.dw = nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden,
                            bias=True)
        self.pw = nn.Conv2d(hidden, hidden, 1, bias=True)
        self.gelu = nn.GELU()  # exact erf, == flax approximate=False
        self.project = nn.Conv2d(hidden, dim, 1, bias=True)

    def forward(self, x):
        return self.project(self.gelu(self.pw(self.dw(self.expand(x)))))

    def load_flax(self, p: Mapping):
        for name in ("expand", "dw", "pw", "project"):
            _load_conv(getattr(self, name), p[name])


class TSegFormerAttention(nn.Module):
    """PreNorm(att) then PreNorm(mff), NO residuals (reference quirk)."""

    def __init__(self, dim: int):
        super().__init__()
        self.norm_att = TChannelLayerNorm(dim)
        self.att = TEfficientSelfAttention(dim)
        self.norm_mff = TChannelLayerNorm(dim)
        self.mff = TMixFeedForward(dim)

    def forward(self, x):
        y = self.att(self.norm_att(x))
        return self.mff(self.norm_mff(y))

    def load_flax(self, p: Mapping, bs: Mapping):
        del bs
        self.norm_att.load_flax(p["norm_att"])
        self.att.load_flax(p["att"])
        self.norm_mff.load_flax(p["norm_mff"])
        self.mff.load_flax(p["mff"])


# ---------------------------------------------------------------------------
# aggregators (modules/aggregators.py)
# ---------------------------------------------------------------------------

class TNetVLAD(nn.Module):
    def __init__(self, dim: int, num_clusters: int, vladv2: bool = False):
        super().__init__()
        self.assign_w = nn.Parameter(torch.zeros(dim, num_clusters))
        self.centroids = nn.Parameter(torch.zeros(num_clusters, dim))
        self.assign_b = nn.Parameter(torch.zeros(num_clusters)) \
            if vladv2 else None

    def forward(self, x):
        B, C, H, W = x.shape
        x = l2n(x, dim=1)
        xf = x.flatten(2).permute(0, 2, 1)       # (B, S, C)
        logits = torch.matmul(xf, self.assign_w)  # (B, S, K)
        if self.assign_b is not None:
            logits = logits + self.assign_b
        a = torch.softmax(logits, dim=-1)
        weighted = torch.matmul(a.transpose(1, 2), xf)       # (B, K, C)
        mass = a.sum(dim=1)                                  # (B, K)
        vlad = weighted - mass.unsqueeze(-1) * self.centroids.unsqueeze(0)
        vlad = l2n(vlad, dim=-1)
        return l2n(vlad.reshape(B, -1), dim=-1)

    def load_flax(self, p: Mapping):
        self.assign_w.data = _t(p["assign_w"])
        self.centroids.data = _t(p["centroids"])
        if self.assign_b is not None:
            self.assign_b.data = _t(p["assign_b"])


class TGeM(nn.Module):
    def __init__(self, eps: float = 1e-6, unshuffle: int = 4):
        super().__init__()
        self.p = nn.Parameter(torch.full((1,), 3.0))
        self.eps, self.unshuffle = eps, unshuffle
        self.unshuffler = nn.PixelUnshuffle(unshuffle)

    def forward(self, x):
        if self.unshuffle > 1:
            x = self.unshuffler(x)
        x = torch.clamp(x, min=self.eps).pow(self.p)
        x = x.mean(dim=(2, 3))
        return x.pow(1.0 / self.p).reshape(x.shape[0], -1)

    def load_flax(self, p: Mapping):
        self.p.data = _t(p["p"])


class TConvAP(nn.Module):
    def __init__(self, c_in: int, out_channels: int, s1: int, s2: int):
        super().__init__()
        self.channel_pool = nn.Conv2d(c_in, out_channels, 1, bias=True)
        self.pool = nn.AdaptiveAvgPool2d((s1, s2))

    def forward(self, x):
        x = self.pool(self.channel_pool(x))
        return l2n(x.flatten(1), dim=-1)

    def load_flax(self, p: Mapping):
        _load_conv(self.channel_pool, p["channel_pool"])


# ---------------------------------------------------------------------------
# heads (modules/heads.py, segmentation.py, vpr.py)
# ---------------------------------------------------------------------------

class TSimpleTaskHead(nn.Module):
    def __init__(self, c_in: int, c_hidden: int, c_out: int, leaky: bool):
        super().__init__()
        self.convDa = TConvBNAct(c_in, c_hidden, leaky)
        self.convDb = nn.Conv2d(c_hidden, c_out, 3, padding=1, bias=True)

    def forward(self, x):
        return self.convDb(self.convDa(x))

    def load_flax(self, p: Mapping, bs: Mapping):
        self.convDa.load_flax(p["convDa"], bs["convDa"])
        _load_conv(self.convDb, p["convDb"])


class TUpscaleHead(nn.Module):
    """Descriptor head: convA/convB -> up2x -> cat skip -> convAa/convBb."""

    def __init__(self, c_in: int, c_skip: int, c1: int, c2: int, c4: int,
                 c5: int, method: str, leaky: bool):
        super().__init__()
        self.convA = TConvBNAct(c_in, c1, leaky)
        self.convB = nn.Conv2d(c1, c2, 3, padding=1, bias=True)
        self.upsample1 = TUpsampler(c2, method, leaky)
        self.convAa = TConvBNAct(c2 // 4 + c_skip, c4, leaky)
        self.convBb = nn.Conv2d(c4, c5, 3, padding=1, bias=True)

    def forward(self, x, skip):
        x = self.convB(self.convA(x))
        x = self.upsample1(x)
        x = torch.cat([x, skip], dim=1)
        return self.convBb(self.convAa(x))

    def load_flax(self, p: Mapping, bs: Mapping):
        self.convA.load_flax(p["convA"], bs["convA"])
        _load_conv(self.convB, p["convB"])
        self.upsample1.load_flax(p.get("upsample1", {}),
                                 bs.get("upsample1", {}))
        self.convAa.load_flax(p["convAa"], bs["convAa"])
        _load_conv(self.convBb, p["convBb"])


class TSegHead(nn.Module):
    """All four segmentation decoders (V2/V3 x plain/ATT), built from the
    same layer plan the flax modules use. `fused` adds the V3 channel
    split (featB / convs_N seg / optional featD)."""

    def __init__(self, c_in: int, ch: int, c_out: int, n_feat: int,
                 d1: int, method: str, leaky: bool, attention: bool,
                 fused: bool, depth: bool):
        super().__init__()
        self.attention, self.fused, self.depth = attention, fused, depth
        up_in = d1
        cat1 = d1 // 4 + c_in   # after up1, concat x
        cat2 = d1 // 4 + c_in   # after up2, concat skip (skip has c_in=c4)
        names = []
        if attention:
            layers = [TConvBNAct(c_in, ch, leaky), TSegFormerAttention(ch),
                      "pool", TSegFormerAttention(ch),
                      TConvBNAct(ch, d1, leaky), "up1", "cat_x",
                      TConvBNAct(cat1, ch, leaky), TConvBNAct(ch, d1, leaky),
                      "up2", "cat_skip"]
        else:
            layers = [TConvBNAct(c_in, ch, leaky), TConvBNAct(ch, ch, leaky),
                      "pool", TConvBNAct(ch, ch, leaky),
                      TConvBNAct(ch, ch, leaky), TConvBNAct(ch, d1, leaky),
                      "up1", "cat_x", TConvBNAct(cat1, ch, leaky),
                      TConvBNAct(ch, d1, leaky), "up2", "cat_skip"]
        self.plan = []
        idx = 0
        for item in layers:
            if isinstance(item, str):
                self.plan.append(item)
            else:
                name = f"convs_{idx}"
                self.add_module(name, item)
                self.plan.append(name)
                names.append(name)
                idx += 1
        self.pool = nn.MaxPool2d(2, 2)
        self.upsample1 = TUpsampler(up_in, method, leaky)
        self.upsample2 = TUpsampler(up_in, method, leaky)

        if fused:
            dim_split = ch // 2
            ch_b = ch + (dim_split if depth else 0)
            self.pre_final = TConvBNAct(cat2, ch_b, leaky)
            self.pre_name = f"convs_{idx}"
            self.dim_split = dim_split
            self.featB = nn.Conv2d(dim_split, n_feat, 3, padding=1,
                                   bias=True)
            self.seg_final = nn.Conv2d(dim_split, c_out, 3, padding=1,
                                       bias=True)
            self.seg_name = f"convs_{idx + 1}"
            if depth:
                self.featD = nn.Conv2d(dim_split, 1, 3, padding=1,
                                       bias=False)
        else:
            self.pre_final = TConvBNAct(cat2, ch, leaky)
            self.pre_name = f"convs_{idx}"
            self.seg_final = nn.Conv2d(ch, c_out, 3, padding=1, bias=True)
            self.seg_name = f"convs_{idx + 1}"

    def forward(self, x, skip):
        y = x
        for step in self.plan:
            if step == "pool":
                y = self.pool(y)
            elif step == "up1":
                y = self.upsample1(y)
            elif step == "up2":
                y = self.upsample2(y)
            elif step == "cat_x":
                y = torch.cat([y, x], dim=1)
            elif step == "cat_skip":
                y = torch.cat([y, skip], dim=1)
            else:
                y = getattr(self, step)(y)
        y = self.pre_final(y)
        if not self.fused:
            return (self.seg_final(y),)
        ds = self.dim_split
        feat = self.featB(y[:, :ds])
        seg = self.seg_final(y[:, -ds:])
        if self.depth:
            return seg, feat, self.featD(y[:, ds:2 * ds])
        return seg, feat

    def load_flax(self, p: Mapping, bs: Mapping):
        for step in self.plan:
            if step.startswith("convs_"):
                getattr(self, step).load_flax(p[step], bs.get(step, {}))
        self.upsample1.load_flax(p.get("upsample1", {}),
                                 bs.get("upsample1", {}))
        self.upsample2.load_flax(p.get("upsample2", {}),
                                 bs.get("upsample2", {}))
        self.pre_final.load_flax(p[self.pre_name], bs[self.pre_name])
        _load_conv(self.seg_final, p[self.seg_name])
        if self.fused:
            _load_conv(self.featB, p["featB"])
            if self.depth:
                _load_conv(self.featD, p["featD"])


class TVPRHead(nn.Module):
    def __init__(self, c_in: int, enc: int, num_clusters: int, leaky: bool,
                 method: str, remove_netvlad: bool):
        super().__init__()
        self.convlad1 = TConvBNAct(c_in, enc, leaky)
        self.convlad2 = TConvBNAct(enc, enc, leaky)
        self.convlad3 = TConvBNAct(enc, enc, leaky)
        self.method, self.remove_netvlad = method, remove_netvlad
        if remove_netvlad:
            self.netvlad = None
        elif method == "netvlad":
            self.netvlad = TNetVLAD(enc, num_clusters)
        elif method == "gem":
            self.netvlad = TGeM(unshuffle=4)
        elif method == "convap":
            self.netvlad = TConvAP(enc, enc, 4, 4)
        else:
            raise ValueError(method)

    def forward(self, x):
        v = self.convlad3(self.convlad2(self.convlad1(x)))
        if self.netvlad is None:
            return v
        return self.netvlad(v)

    def load_flax(self, p: Mapping, bs: Mapping):
        for name in ("convlad1", "convlad2", "convlad3"):
            getattr(self, name).load_flax(p[name], bs[name])
        if self.netvlad is not None:
            self.netvlad.load_flax(p["netvlad"])


# ---------------------------------------------------------------------------
# backbone + models
# ---------------------------------------------------------------------------

class TBackBone(nn.Module):
    def __init__(self, c1: int, c2: int, c3: int, c4: int, downsample: int,
                 leaky: bool):
        super().__init__()
        self.downsample = downsample
        self.conv1a = TConvBNAct(3, c1, leaky)
        self.conv1b = TConvBNAct(c1, c2, leaky)
        self.conv2a = TConvBNAct(c2, c2, leaky)
        self.conv2b = TConvBNAct(c2, c3, leaky)
        self.conv3a = TConvBNAct(c3, c3, leaky)
        self.conv3b = TConvBNAct(c3, c4, leaky)
        self.conv4a = TConvBNAct(c4, c4, leaky)
        self.conv4b = TConvBNAct(c4, c4, leaky)
        self.pool = nn.MaxPool2d(2, 2)

    def forward(self, x):
        x = self.conv1b(self.conv1a(x))
        if self.downsample >= 2:
            x = self.pool(x)
        x = self.conv2b(self.conv2a(x))
        if self.downsample >= 3:
            x = self.pool(x)
        skip = self.conv3b(self.conv3a(x))
        x = self.pool(skip) if self.downsample >= 1 else skip
        x = self.conv4b(self.conv4a(x))
        return x, skip

    def load_flax(self, p: Mapping, bs: Mapping):
        for name in ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a",
                     "conv3b", "conv4a", "conv4b"):
            getattr(self, name).load_flax(p[name], bs[name])


class KP2DTinyMirror(nn.Module):
    """Torch twin of models/kp2dtiny.{KP2DTinyV2,KP2DTinyV3} (eval-mode
    forward). Returns the reference export tuple
    (score, coord, desc, vlad, seg[, depth]) in NCHW."""

    def __init__(self, cfg: KP2DTinyConfig):
        super().__init__()
        self.cfg = cfg
        c1, c2, c3, c4, c5, d1 = cfg.channel_dims
        leaky = cfg.leaky_relu
        method = cfg.upscale_method
        self.backbone = TBackBone(c1, c2, c3, c4, cfg.downsample, leaky)

        if cfg.variant == "v3":
            self.score_loc_head = TSimpleTaskHead(c4, c4, 3, leaky)
            self.seg_head = TSegHead(c4, c5, cfg.n_classes, cfg.nfeatures,
                                     d1, method, leaky, cfg.use_attention,
                                     fused=True, depth=cfg.depth)
        else:
            self.score_head = TSimpleTaskHead(c4, c4, 1, leaky)
            self.loc_head = TSimpleTaskHead(c4, c4, 2, leaky)
            self.desc_head = TUpscaleHead(c4, c4, c4, c3 * 4, c4,
                                          cfg.nfeatures, method, leaky)
            self.seg_head = TSegHead(c4, c5, cfg.n_classes, cfg.nfeatures,
                                     d1, method, leaky, cfg.use_attention,
                                     fused=False, depth=False)
            if cfg.depth:
                self.depth_head = TSegHead(c4, c5, 1, cfg.nfeatures, d1,
                                           method, leaky, cfg.use_attention,
                                           fused=False, depth=False)
        self.vlad_head = TVPRHead(c4, cfg.enc_dim, cfg.num_clusters, leaky,
                                  cfg.global_descriptor_method,
                                  cfg.remove_netvlad)

    def forward(self, x) -> Tuple[torch.Tensor, ...]:
        cfg = self.cfg
        feat_x, skip = self.backbone(x)
        vlad = self.vlad_head(feat_x)
        if cfg.variant == "v3":
            score_loc = self.score_loc_head(feat_x)
            score = torch.sigmoid(score_loc[:, 0:1])
            coord = torch.tanh(score_loc[:, 1:3])
            seg_out = self.seg_head(feat_x, skip)
            if cfg.depth:
                seg, feat, depth = seg_out
            else:
                seg, feat = seg_out
            seg = torch.softmax(seg, dim=1)  # V3 eval softmax
            if cfg.depth:
                return (score, coord, feat, vlad, seg,
                        torch.sigmoid(depth))
            return score, coord, feat, vlad, seg
        score = torch.sigmoid(self.score_head(feat_x))
        coord = torch.tanh(self.loc_head(feat_x))
        feat = self.desc_head(feat_x, skip)
        (seg,) = self.seg_head(feat_x, skip)
        if cfg.depth:
            (depth,) = self.depth_head(feat_x, skip)
            return (score, coord, feat, vlad, seg,
                    torch.sigmoid(depth))
        return score, coord, feat, vlad, seg

    def load_flax(self, params: Mapping, batch_stats: Mapping):
        p = params
        bs = batch_stats
        self.backbone.load_flax(p["backbone"], bs["backbone"])
        self.vlad_head.load_flax(p["vlad_head"], bs["vlad_head"])
        if self.cfg.variant == "v3":
            self.score_loc_head.load_flax(p["score_loc_head"],
                                          bs["score_loc_head"])
            self.seg_head.load_flax(p["seg_head"], bs["seg_head"])
        else:
            self.score_head.load_flax(p["score_head"], bs["score_head"])
            self.loc_head.load_flax(p["loc_head"], bs["loc_head"])
            self.desc_head.load_flax(p["desc_head"], bs["desc_head"])
            self.seg_head.load_flax(p["seg_head"], bs["seg_head"])
            if self.cfg.depth:
                self.depth_head.load_flax(p["depth_head"], bs["depth_head"])
        return self


def build_torch_mirror(cfg: KP2DTinyConfig,
                       params: Optional[Mapping] = None,
                       batch_stats: Optional[Mapping] = None
                       ) -> KP2DTinyMirror:
    m = KP2DTinyMirror(cfg)
    if params is not None:
        m.load_flax(params, batch_stats or {})
    return m.eval()


# ---------------------------------------------------------------------------
# KeypointFormer (models/keypoint_former.py; reference kp2d_former.py +
# segformer.py, the third model type of the reference's export_onnx CLI)
# ---------------------------------------------------------------------------

def _load_bn(bn: nn.BatchNorm2d, p: Mapping, bs: Mapping):
    bn.weight.data = _t(p["scale"])
    bn.bias.data = _t(p["bias"])
    bn.running_mean.data = _t(bs["mean"])
    bn.running_var.data = _t(bs["var"])


class TMiT(nn.Module):
    """Mix Transformer pyramid encoder twin of keypoint_former.MiT:
    4 stages of [overlap-patch embed conv, num_layers x (PreNorm att +
    residual, PreNorm mix-FF + residual)]; returns all stage outputs."""

    _KSP = ((7, 4, 3), (3, 2, 1), (3, 2, 1), (3, 2, 1))

    def __init__(self, cfg):
        super().__init__()
        self.num_layers = cfg.num_layers
        c_in = 3
        self.embeds = nn.ModuleList()
        self.norms_att = nn.ModuleList()
        self.atts = nn.ModuleList()
        self.norms_mff = nn.ModuleList()
        self.mffs = nn.ModuleList()
        for s, (dim, (k, stride, pad)) in enumerate(zip(cfg.dims,
                                                        self._KSP)):
            self.embeds.append(nn.Conv2d(c_in, dim, k, stride=stride,
                                         padding=pad, bias=True))
            for _ in range(cfg.num_layers):
                self.norms_att.append(TChannelLayerNorm(dim))
                self.atts.append(TEfficientSelfAttention(
                    dim, cfg.heads[s], cfg.reduction_ratio[s]))
                self.norms_mff.append(TChannelLayerNorm(dim))
                self.mffs.append(TMixFeedForward(dim, cfg.ff_expansion[s]))
            c_in = dim

    def forward(self, x):
        outs = []
        for s, embed in enumerate(self.embeds):
            x = embed(x)
            for l in range(self.num_layers):
                i = s * self.num_layers + l
                x = x + self.atts[i](self.norms_att[i](x))
                x = x + self.mffs[i](self.norms_mff[i](x))
            outs.append(x)
        return outs

    def load_flax(self, p: Mapping):
        for s, embed in enumerate(self.embeds):
            _load_conv(embed, p[f"stage{s}_embed"])
            for l in range(self.num_layers):
                i = s * self.num_layers + l
                self.norms_att[i].load_flax(p[f"stage{s}_l{l}_norm_att"])
                self.atts[i].load_flax(p[f"stage{s}_l{l}_att"])
                self.norms_mff[i].load_flax(p[f"stage{s}_l{l}_norm_mff"])
                self.mffs[i].load_flax(p[f"stage{s}_l{l}_mff"])


class _TConvHead(nn.Module):
    """keypoint_former.KeypointFormer.head(): a list of
    (feats, kernel, stride, pad, bn) convs, BN+ReLU after bn-flagged."""

    def __init__(self, c_in: int, convs):
        super().__init__()
        self.convs = nn.ModuleList()
        self.bns = nn.ModuleList()
        self.has_bn = []
        for feats, kernel, stride, pad, bn in convs:
            self.convs.append(nn.Conv2d(c_in, feats, kernel, stride=stride,
                                        padding=pad, bias=True))
            self.bns.append(nn.BatchNorm2d(feats, eps=1e-5)
                            if bn else nn.Identity())
            self.has_bn.append(bn)
            c_in = feats

    def forward(self, x):
        for conv, bn, has in zip(self.convs, self.bns, self.has_bn):
            x = conv(x)
            if has:
                x = torch.relu(bn(x))
        return x

    def load_flax(self, name: str, p: Mapping, bs: Mapping):
        for j, (conv, bn, has) in enumerate(zip(self.convs, self.bns,
                                                self.has_bn)):
            _load_conv(conv, p[f"{name}_conv{j}"])
            if has:
                _load_bn(bn, p[f"{name}_bn{j}"], bs[f"{name}_bn{j}"])


class KeypointFormerMirror(nn.Module):
    """Torch twin of models/keypoint_former.KeypointFormer (eval-mode
    forward). Returns (score, coord, desc, vlad, seg) in NCHW — the
    reference export_onnx.py's KeypointFormer output list."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d = cfg.decoder_dim
        self.mit = TMiT(cfg)
        self.fused_convs = nn.ModuleList(
            nn.Conv2d(dim, d, 1, bias=True) for dim in cfg.dims)
        self.fused_bns = nn.ModuleList(
            nn.BatchNorm2d(d, eps=1e-5) for _ in cfg.dims)
        self.ups = nn.ModuleList(
            nn.Upsample(scale_factor=2 ** i, mode="nearest") if i else
            nn.Identity() for i in range(len(cfg.dims)))
        c = 4 * d
        self.seg = _TConvHead(c, [(d, 1, 1, 0, True),
                                  (cfg.n_classes, 1, 1, 0, False)])
        self.score = _TConvHead(c, [(d, 3, 2, 1, True),
                                    (1, 1, 1, 0, False)])
        self.loc = _TConvHead(c, [(d, 3, 2, 1, True),
                                  (2, 1, 1, 0, False)])
        self.feat = _TConvHead(c, [(d, 1, 1, 0, True), (d, 3, 1, 1, True),
                                   (cfg.feat_dim, 1, 1, 0, False)])
        self.vlad = _TConvHead(c, [(d, 1, 2, 1, True),
                                   (cfg.feat_dim, 1, 1, 0, False)])
        self.netvlad = TNetVLAD(cfg.feat_dim, cfg.num_clusters, vladv2=True)

    def forward(self, x):
        stage_outs = self.mit(x)
        fused = [up(torch.relu(bn(conv(so))))
                 for so, conv, bn, up in zip(stage_outs, self.fused_convs,
                                             self.fused_bns, self.ups)]
        fused = torch.cat(fused, dim=1)
        score = torch.sigmoid(self.score(fused))
        coord = torch.tanh(self.loc(fused))
        feat = self.feat(fused)
        seg = self.seg(fused)
        vlad = self.netvlad(torch.relu(self.vlad(fused)))
        return score, coord, feat, vlad, seg

    def load_flax(self, params: Mapping, batch_stats: Mapping):
        p, bs = params, batch_stats
        self.mit.load_flax(p["mit"])
        for i, (conv, bn) in enumerate(zip(self.fused_convs,
                                           self.fused_bns)):
            _load_conv(conv, p[f"to_fused{i}_conv"])
            _load_bn(bn, p[f"to_fused{i}_bn"], bs[f"to_fused{i}_bn"])
        for name in ("seg", "score", "loc", "feat", "vlad"):
            getattr(self, name).load_flax(name, p, bs)
        self.netvlad.load_flax(p["netvlad"])
        return self


def build_keypoint_former_mirror(cfg, params: Optional[Mapping] = None,
                                 batch_stats: Optional[Mapping] = None
                                 ) -> KeypointFormerMirror:
    m = KeypointFormerMirror(cfg)
    if params is not None:
        m.load_flax(params, batch_stats or {})
    return m.eval()


# ---------------------------------------------------------------------------
# ONNX export
# ---------------------------------------------------------------------------

OUTPUT_NAMES = ("score", "coord", "desc", "vlad", "seg")


def export_onnx(model: KP2DTinyMirror, path: str, im_h: int, im_w: int,
                opset: int = 16) -> str:
    """torch.onnx.export with the reference's contract
    (export_onnx.py:70-79): opset 16, input "image" (1, 3, H, W),
    named outputs. Patches the exporter's onnxscript post-pass (a no-op
    for plain ATen graphs) when the `onnx` package is absent."""
    try:
        import onnx  # noqa: F401
    except ImportError:
        from torch.onnx._internal.torchscript_exporter import (
            onnx_proto_utils)
        onnx_proto_utils._add_onnxscript_fn = \
            lambda model_bytes, custom_opsets: model_bytes

    names = list(OUTPUT_NAMES)
    if getattr(model.cfg, "depth", False):
        names.append("depth")
    model = model.eval()
    x = torch.randn(1, 3, im_h, im_w)
    torch.onnx.export(model, x, path, opset_version=opset,
                      input_names=["image"], output_names=names,
                      do_constant_folding=False, dynamo=False)
    return path
