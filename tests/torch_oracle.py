"""Independent PyTorch oracle of the EGM-UNet modules, written from the
documented formulas (SURVEY.md §2.1; ref: src/EGM-UNet.py) for parity
testing.  This is *test-only* code: the framework itself never imports torch.

Submodule names intentionally mirror the flax module names in
``egm_unet_tpu.nn`` / ``egm_unet_tpu.models`` so weights can be transferred
mechanically (see ``load_flax_params``).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------- primitives
class TBasicConv(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, dilation=1, groups=1,
                 relu=True, bn=True, bias=False):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, padding, dilation, groups, bias=bias)
        self.bn = nn.BatchNorm2d(cout, eps=1e-5, momentum=0.01) if bn else None
        self.relu = relu

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.relu else x


class TConvBNReLU(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TDoubleConv(nn.Module):
    def __init__(self, cin, cout, mid=None):
        super().__init__()
        mid = mid or cout
        self.c1 = TConvBNReLU(cin, mid)
        self.c2 = TConvBNReLU(mid, cout)

    def forward(self, x):
        return self.c2(self.c1(x))


class TEdgeAware(nn.Module):
    """edge = x - avgpool3(x); w = sigmoid(BN(1x1(edge))); out = w*x + x."""

    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 1)
        self.bn = nn.BatchNorm2d(c)

    def forward(self, x):
        edge = x - F.avg_pool2d(x, 3, 1, 1)
        w = torch.sigmoid(self.bn(self.conv(edge)))
        return w * x + x


# ---------------------------------------------------------------- attention
class TMCAGate(nn.Module):
    """Gate along channel dim of its (possibly permuted) input."""

    def __init__(self, k):
        super().__init__()
        self.conv = nn.Conv2d(1, 1, (1, k), padding=(0, (k - 1) // 2), bias=False)
        self.weight = nn.Parameter(torch.rand(2))

    def forward(self, x):
        b, c, _, _ = x.shape
        avg = F.adaptive_avg_pool2d(x, 1)
        std = x.reshape(b, c, -1).std(dim=2, keepdim=True).reshape(b, c, 1, 1)
        w = torch.sigmoid(self.weight)
        out = 0.5 * (avg + std) + w[0] * avg + w[1] * std
        out = self.conv(out.permute(0, 3, 2, 1)).permute(0, 3, 2, 1)
        return x * torch.sigmoid(out).expand_as(x)


def t_channel_shuffle(x, groups=4):
    b, c, h, w = x.shape
    return x.view(b, groups, c // groups, h, w).transpose(1, 2).reshape(b, c, h, w)


class TMCALayer(nn.Module):
    def __init__(self, c):
        super().__init__()
        temp = round(abs((math.log2(c) - 1) / 1.5))
        k = temp if temp % 2 else temp - 1
        self.h_cw, self.w_hc, self.c_hw = TMCAGate(3), TMCAGate(3), TMCAGate(max(k, 1))

    def forward(self, x):
        x_h = self.h_cw(x.permute(0, 2, 1, 3)).permute(0, 2, 1, 3)
        x_w = self.w_hc(x.permute(0, 3, 2, 1)).permute(0, 3, 2, 1)
        x_c = self.c_hw(x)
        x_out = (x_c + x_h + x_w) / 3
        lr = F.max_pool2d(x_out, 3, 1, 1) + F.max_pool2d(-x_out, 3, 1, 1)
        mean = F.avg_pool2d(x_out, 3, 1, 1)
        lv = F.avg_pool2d((x_out - mean) ** 2, 3, 1, 1)
        f = torch.fft.fft2(x_out, norm="ortho")
        freq = torch.fft.ifft2(torch.abs(f) * 1.1 * torch.exp(1j * torch.angle(f)),
                               norm="ortho").real
        return 0.4 * x_out + 0.2 * lr + 0.2 * lv + 0.1 * freq + 0.1 * t_channel_shuffle(x_out)


class TRGA(nn.Module):
    def __init__(self, dim, order=2, reduction=8, k=3):
        super().__init__()
        split = [dim // (2**i) for i in range(1, order)]
        split.append(dim // (2 ** (order - 1)))
        split.reverse()
        if sum(split) > dim:
            split[-1] = dim - sum(split[:-1])
        self.split = split
        self.proj_in = nn.Conv2d(dim, split[0] + sum(split), 1)
        self.dwconv = nn.Conv2d(sum(split), sum(split), k, padding=k // 2, groups=sum(split))
        self.scale = nn.Parameter(torch.tensor(1.0))
        self.gates = nn.ModuleList()
        for s in split:
            self.gates.append(nn.Sequential(
                nn.Conv2d(s, max(s // reduction, 8), 1), nn.GELU(),
                nn.Conv2d(max(s // reduction, 8), 1, 1), nn.Sigmoid()))
        self.transforms = nn.ModuleList(
            [nn.Conv2d(split[i], split[i + 1], 1) for i in range(order - 1)])
        self.proj_out = nn.Conv2d(split[-1], dim, 1)

    def forward(self, x):
        fused = self.proj_in(x)
        base, gates = torch.split(fused, [self.split[0], sum(self.split)], dim=1)
        gates = self.dwconv(gates) * self.scale
        gate_list = torch.split(gates, self.split, dim=1)
        out = base
        for i, g in enumerate(gate_list):
            out = out * self.gates[i](g)
            if i < len(self.split) - 1:
                out = self.transforms[i](out)
        return self.proj_out(out)


# --------------------------------------------------------------------- GRFB
class TChannelAttention(nn.Module):
    def __init__(self, c, reduction=4):
        super().__init__()
        self.down = nn.Conv2d(c, c // reduction, 1, bias=False)
        self.up = nn.Conv2d(c // reduction, c, 1, bias=False)

    def forward(self, x):
        a = self.up(F.relu(self.down(F.adaptive_avg_pool2d(x, 1))))
        m = self.up(F.relu(self.down(F.adaptive_max_pool2d(x, 1))))
        return torch.sigmoid(a + m)


class TSpatialAttention(nn.Module):
    def __init__(self, k=7):
        super().__init__()
        self.conv = nn.Conv2d(2, 1, k, padding=k // 2, bias=False)

    def forward(self, x):
        s = torch.cat([x.mean(1, keepdim=True), x.max(1, keepdim=True)[0]], dim=1)
        return torch.sigmoid(self.conv(s))


class TFusionConv(nn.Module):
    def __init__(self, cin, cout, factor=4.0):
        super().__init__()
        dim = int(cout // factor)
        self.down = nn.Conv2d(2 * cin, dim, 1)
        self.conv3 = nn.Conv2d(dim, dim, 3, padding=1)
        self.conv5 = nn.Conv2d(dim, dim, 5, padding=2)
        self.conv7 = nn.Conv2d(dim, dim, 7, padding=3)
        self.spatial = TSpatialAttention()
        self.channel = TChannelAttention(dim)
        self.up = nn.Conv2d(dim, cout, 1)

    def forward(self, x1, x2):
        x = self.down(torch.cat([x1, x2], dim=1))
        res = x
        s = self.conv3(x) + self.conv5(x) + self.conv7(x)
        s = s * self.spatial(s)
        return self.up(res + s * self.channel(x))


class TEGRFB(nn.Module):
    def __init__(self, cin, cout, stride=1, scale=0.1, visual=12):
        super().__init__()
        i = max(cin // 8, 4)
        v = visual
        self.scale = scale
        self.edge_enhancer = TEdgeAware(cin)
        self.dir0 = TBasicConv(cin, 2 * i, 1)
        self.dir1 = TBasicConv(2 * i, 2 * i, 3, padding=v, dilation=v, relu=False)
        self.dir2 = TBasicConv(2 * i, 2 * i, 1)
        self.edge0 = TBasicConv(cin, i, 1)
        self.edge_eafe = TEdgeAware(i)
        self.edge1 = TBasicConv(i, 2 * i, 3, stride, padding=1, groups=i)
        self.edge2 = TBasicConv(2 * i, 2 * i, 3, padding=2 * v, dilation=2 * v, relu=False)
        self.edge3 = TBasicConv(2 * i, 2 * i, 1)
        self.ctx0 = TBasicConv(cin, i, 3, padding=1)
        self.ctx1 = TBasicConv(i, 2 * i, 3, stride, padding=1, groups=2)
        self.ctx2 = TBasicConv(2 * i, 2 * i, 3, padding=3 * v, dilation=3 * v, relu=False)
        self.ctx3 = TBasicConv(2 * i, 2 * i, 1)
        self.fusion = TFusionConv(cin + 6 * i, cout)
        self.shortcut = TBasicConv(cin, cout, 1, stride, relu=False)
        self.target_enhancer = nn.Conv2d(cout, 3, 3, padding=1)

    def forward(self, x):
        xe = self.edge_enhancer(x)
        d = self.dir2(self.dir1(self.dir0(xe)))
        e = self.edge3(self.edge2(self.edge1(self.edge_eafe(self.edge0(xe)))))
        c = self.ctx3(self.ctx2(self.ctx1(self.ctx0(xe))))
        concat = torch.cat([x, d, e, c], dim=1)
        out = self.fusion(concat, concat)
        out = F.relu(out * self.scale + self.shortcut(x))
        tw = torch.sigmoid(self.target_enhancer(out))
        return out * (1 + tw.mean(dim=1, keepdim=True))


class TGRFB(nn.Module):
    def __init__(self, cin, cout, stride=1, scale=0.1, visual=12):
        super().__init__()
        i = cin // 8
        v = visual
        self.scale = scale
        self.b0 = nn.Sequential(
            TBasicConv(cin, 2 * i, 1, stride),
            TBasicConv(2 * i, 2 * i, 3, 1, padding=v, dilation=v, relu=False),
            TBasicConv(2 * i, 2 * i, 1, stride))
        self.b1 = nn.Sequential(
            TBasicConv(cin, i, 1),
            TBasicConv(i, 2 * i, 3, stride, padding=1, groups=i),
            TBasicConv(2 * i, 2 * i, 1, stride),
            TBasicConv(2 * i, 2 * i, 3, 1, padding=2 * v, dilation=2 * v, relu=False),
            TBasicConv(2 * i, 2 * i, 1))
        self.b2 = nn.Sequential(
            TBasicConv(cin, i, 1),
            TBasicConv(i, 2 * i, 3, 1, padding=1, groups=i),
            TBasicConv(2 * i, 2 * i, 1, stride),
            TBasicConv(2 * i, 2 * i, 3, stride, padding=1, groups=2 * i),
            TBasicConv(2 * i, 2 * i, 1, stride),
            TBasicConv(2 * i, 2 * i, 3, 1, padding=3 * v, dilation=3 * v, relu=False),
            TBasicConv(2 * i, 2 * i, 1, stride))
        self.conv_linear = TBasicConv(14 * i, cout, 1, relu=False)
        self.shortcut = TBasicConv(cin, cout, 1, stride, relu=False)

    def forward(self, x):
        out = torch.cat([x, self.b0(x), self.b1(x), self.b2(x)], dim=1)
        out = self.conv_linear(out)
        return F.relu(out * self.scale + self.shortcut(x))


# --------------------------------------------------------------- full model
class TDoubleConv1(nn.Module):
    def __init__(self, cin, cout, block="edge", use_mca=True):
        super().__init__()
        self.c1 = TConvBNReLU(cin, cout)
        self.mca = TMCALayer(cout) if use_mca else None
        self.c2 = TConvBNReLU(cout, cout)
        if block == "edge":
            self.block = TEGRFB(cout, cout)
        elif block == "grfb":
            self.block = TGRFB(cout, cout)
        else:
            self.block = None

    def forward(self, x):
        x = self.c1(x)
        if self.mca is not None:
            x = self.mca(x)
        x = self.c2(x)
        if self.block is not None:
            x = self.block(x)
        return x


class TUp(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TDoubleConv(cin, cout, cin // 2)

    def forward(self, x1, x2):
        x1 = F.interpolate(x1, scale_factor=2, mode="bilinear", align_corners=True)
        dy, dx = x2.size(2) - x1.size(2), x2.size(3) - x1.size(3)
        x1 = F.pad(x1, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
        return self.conv(torch.cat([x2, x1], dim=1))


class TEGMUNet(nn.Module):
    def __init__(self, cin=3, num_classes=2, base_c=32, block="edge",
                 use_rga=True, use_mca=True):
        super().__init__()
        c = base_c
        self.in_conv = TDoubleConv(cin, c)
        self.down1 = TDoubleConv1(c, 2 * c, block, use_mca)
        self.down2 = TDoubleConv1(2 * c, 4 * c, block, use_mca)
        self.down3 = TDoubleConv1(4 * c, 8 * c, block, use_mca)
        self.down4 = TDoubleConv1(8 * c, 8 * c, block, use_mca)
        self.attn1 = TRGA(8 * c) if use_rga else None
        self.up1 = TUp(16 * c, 4 * c)
        self.up2 = TUp(8 * c, 2 * c)
        self.up3 = TUp(4 * c, c)
        self.up4 = TUp(2 * c, c)
        self.out_conv = nn.Conv2d(c, num_classes, 1)

    def forward(self, x):
        x1 = self.in_conv(x)
        x2 = self.down1(F.max_pool2d(x1, 2))
        x3 = self.down2(F.max_pool2d(x2, 2))
        x4 = self.down3(F.max_pool2d(x3, 2))
        x5 = self.down4(F.max_pool2d(x4, 2))
        if self.attn1 is not None:
            x5 = self.attn1(x5)
        x = self.up1(x5, x4)
        x = self.up2(x, x3)
        x = self.up3(x, x2)
        x = self.up4(x, x1)
        return {"out": self.out_conv(x)}


# --------------------------------------------------------- weight transfer
def _np(a):
    return np.asarray(a)


def set_conv(tconv: nn.Conv2d, fp: dict):
    """flax Conv wrapper params ({'Conv_0': {'kernel' HWIO, 'bias'?}})."""
    inner = fp["Conv_0"] if "Conv_0" in fp else fp
    k = _np(inner["kernel"])  # HWIO
    tconv.weight.data = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())
    if "bias" in inner:
        tconv.bias.data = torch.from_numpy(_np(inner["bias"]).copy())


def set_bn(tbn: nn.BatchNorm2d, fp: dict, fs: dict):
    inner_p = fp["BatchNorm_0"] if "BatchNorm_0" in fp else fp
    inner_s = fs["BatchNorm_0"] if "BatchNorm_0" in fs else fs
    tbn.weight.data = torch.from_numpy(_np(inner_p["scale"]).copy())
    tbn.bias.data = torch.from_numpy(_np(inner_p["bias"]).copy())
    tbn.running_mean.data = torch.from_numpy(_np(inner_s["mean"]).copy())
    tbn.running_var.data = torch.from_numpy(_np(inner_s["var"]).copy())


def set_basic_conv(t: TBasicConv, fp: dict, fs: dict):
    set_conv(t.conv, fp["Conv_0"])
    if t.bn is not None:
        set_bn(t.bn, fp["BatchNorm_0"], fs["BatchNorm_0"])


def set_convbnrelu(t: TConvBNReLU, fp: dict, fs: dict):
    set_conv(t.conv, fp["Conv_0"])
    set_bn(t.bn, fp["BatchNorm_0"], fs["BatchNorm_0"])


def set_double_conv(t: TDoubleConv, fp: dict, fs: dict):
    set_convbnrelu(t.c1, fp["ConvBNReLU_0"], fs["ConvBNReLU_0"])
    set_convbnrelu(t.c2, fp["ConvBNReLU_1"], fs["ConvBNReLU_1"])


def set_edge_aware(t: TEdgeAware, fp: dict, fs: dict):
    set_conv(t.conv, fp["Conv_0"])
    set_bn(t.bn, fp["BatchNorm_0"], fs["BatchNorm_0"])


def set_mcagate(t: TMCAGate, fp: dict):
    t.weight.data = torch.from_numpy(_np(fp["weight"]).copy())
    k = _np(fp["conv"])  # (k,)
    t.conv.weight.data = torch.from_numpy(k.reshape(1, 1, 1, -1).copy())


def set_mca(t: TMCALayer, fp: dict):
    set_mcagate(t.h_cw, fp["h_cw"])
    set_mcagate(t.w_hc, fp["w_hc"])
    set_mcagate(t.c_hw, fp["c_hw"])


def set_rga(t: TRGA, fp: dict):
    set_conv(t.proj_in, fp["proj_in"])
    set_conv(t.dwconv, fp["dwconv"])
    t.scale.data = torch.tensor(float(_np(fp["scale"])))
    for i in range(len(t.split)):
        set_conv(t.gates[i][0], fp[f"gate{i}_down"])
        set_conv(t.gates[i][2], fp[f"gate{i}_up"])
        if i < len(t.split) - 1:
            set_conv(t.transforms[i], fp[f"transform{i}"])
    set_conv(t.proj_out, fp["proj_out"])


def _set_raw_conv(tconv, kernel, bias=None):
    tconv.weight.data = torch.from_numpy(
        np.transpose(_np(kernel), (3, 2, 0, 1)).copy())
    if bias is not None:
        tconv.bias.data = torch.from_numpy(_np(bias).copy())


def set_fusion(t: TFusionConv, fp: dict):
    _set_raw_conv(t.down, fp["down_kernel"], fp["down_bias"])
    _set_raw_conv(t.conv3, fp["conv3_kernel"], fp["conv3_bias"])
    _set_raw_conv(t.conv5, fp["conv5_kernel"], fp["conv5_bias"])
    _set_raw_conv(t.conv7, fp["conv7_kernel"], fp["conv7_bias"])
    set_conv(t.spatial.conv, fp["spatial"]["Conv_0"])
    set_conv(t.channel.down, fp["channel"]["fc_down"])
    set_conv(t.channel.up, fp["channel"]["fc_up"])
    set_conv(t.up, fp["up"])


def set_egrfb(t: TEGRFB, fp: dict, fs: dict):
    set_edge_aware(t.edge_enhancer, fp["edge_enhancer"], fs["edge_enhancer"])
    for name in ["dir0", "dir1", "dir2", "edge0", "edge1", "edge2", "edge3",
                 "ctx0", "ctx1", "ctx2", "ctx3", "shortcut"]:
        set_basic_conv(getattr(t, name), fp[name], fs[name])
    set_edge_aware(t.edge_eafe, fp["edge_eafe"], fs["edge_eafe"])
    set_fusion(t.fusion, fp["fusion"])
    set_conv(t.target_enhancer, fp["target_enhancer"])


def set_grfb(t: TGRFB, fp: dict, fs: dict):
    for seq, names in [(t.b0, ["b0_0", "b0_1", "b0_2"]),
                       (t.b1, ["b1_0", "b1_1", "b1_2", "b1_3", "b1_4"]),
                       (t.b2, ["b2_0", "b2_1", "b2_2", "b2_3", "b2_4", "b2_5", "b2_6"])]:
        for m, n in zip(seq, names):
            set_basic_conv(m, fp[n], fs[n])
    set_basic_conv(t.conv_linear, fp["conv_linear"], fs["conv_linear"])
    set_basic_conv(t.shortcut, fp["shortcut"], fs["shortcut"])


def set_double_conv1(t: TDoubleConv1, fp: dict, fs: dict):
    set_convbnrelu(t.c1, fp["conv1"], fs["conv1"])
    set_convbnrelu(t.c2, fp["conv2"], fs["conv2"])
    if t.mca is not None:
        set_mca(t.mca, fp["mca"])
    if isinstance(t.block, TEGRFB):
        set_egrfb(t.block, fp["egrfb"], fs["egrfb"])
    elif isinstance(t.block, TGRFB):
        set_grfb(t.block, fp["grfb"], fs["grfb"])


def set_up(t: TUp, fp: dict, fs: dict):
    set_double_conv(t.conv, fp["DoubleConv_0"], fs["DoubleConv_0"])


def set_egm_unet(t: TEGMUNet, variables: dict):
    fp, fs = variables["params"], variables["batch_stats"]
    set_double_conv(t.in_conv, fp["in_conv"], fs["in_conv"])
    for i in range(1, 5):
        set_double_conv1(getattr(t, f"down{i}"), fp[f"down{i}"], fs[f"down{i}"])
    if t.attn1 is not None:
        set_rga(t.attn1, fp["attn1"])
    for i in range(1, 5):
        set_up(getattr(t, f"up{i}"), fp[f"up{i}"], fs[f"up{i}"])
    set_conv(t.out_conv, fp["out_conv"])
