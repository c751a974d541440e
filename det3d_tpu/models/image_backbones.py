"""Image-domain backbones (ResNet / SENet / SSDVGG), flax NHWC.

Parity: det3d/models/backbones/{resnet.py, senet.py, ssd_vgg.py} — the
reference's legacy image backbones, registered but unused by the shipped
lidar configs; provided so image-domain experiment configs have the same
surface. Config knobs kept: ResNet depth/num_stages/strides/dilations/
out_indices/style/frozen_stages/norm_eval, SENet groups/reduction, SSDVGG
input_size/out_feature_indices/l2_norm_scale. Dropped knobs the reference
itself never enables in this repo (dcn/gcb/gen_attention plugins, with_cp
— jax.checkpoint subsumes the latter).

TPU notes: NHWC layout, convs lower straight onto the MXU;
``frozen_stages`` freezes with ``lax.stop_gradient`` + running-stat BN
(the functional analogue of requires_grad_(False) + BN.eval()).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from det3d_tpu.models.norm import build_norm
from det3d_tpu.models.registry import BACKBONES, NECKS


def _conv(f, k, s=1, d=1, name=None):
    pad = ((k - 1) * d + 1) // 2
    return nn.Conv(f, (k, k), strides=(s, s), kernel_dilation=(d, d),
                   padding=[(pad, pad), (pad, pad)], use_bias=False,
                   name=name)


class BasicBlock(nn.Module):
    """resnet.py:14-89. expansion = 1."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: build_norm(self.norm_cfg)
        identity = x
        out = _conv(self.planes, 3, self.stride, self.dilation)(x)
        out = nn.relu(bn()(out, use_running_average=not train))
        out = _conv(self.planes, 3, 1, self.dilation)(out)
        out = bn()(out, use_running_average=not train)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
            identity = bn()(identity, use_running_average=not train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """resnet.py:91-250. expansion = 4; ``style`` places the stride on
    conv1 (caffe) or conv2 (pytorch), exactly the reference's toggle.
    ``se_reduction`` > 0 adds squeeze-excitation (senet.py's SE path)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    style: str = "pytorch"
    groups: int = 1
    se_reduction: int = 0
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: build_norm(self.norm_cfg)
        s1, s2 = ((self.stride, 1) if self.style == "caffe"
                  else (1, self.stride))
        identity = x
        out = nn.Conv(self.planes, (1, 1), strides=(s1, s1),
                      use_bias=False)(x)
        out = nn.relu(bn()(out, use_running_average=not train))
        pad = self.dilation
        out = nn.Conv(self.planes, (3, 3), strides=(s2, s2),
                      kernel_dilation=(self.dilation, self.dilation),
                      padding=[(pad, pad), (pad, pad)],
                      feature_group_count=self.groups, use_bias=False)(out)
        out = nn.relu(bn()(out, use_running_average=not train))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False)(out)
        out = bn()(out, use_running_average=not train)
        if self.se_reduction:
            squeeze = jnp.mean(out, axis=(1, 2))             # (B, C)
            e = nn.relu(nn.Dense(self.planes * 4
                                 // self.se_reduction)(squeeze))
            e = nn.sigmoid(nn.Dense(self.planes * 4)(e))
            out = out * e[:, None, None, :]
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
            identity = bn()(identity, use_running_average=not train)
        return nn.relu(out + identity)


_ARCH = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


@BACKBONES.register_module
class ResNet(nn.Module):
    """resnet.py:344-521: stem (7x7/2 + maxpool/2) + 4 stages, returning
    the feature maps named by ``out_indices``."""
    depth: int
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    style: str = "pytorch"
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None
    norm_eval: bool = True
    groups: int = 1
    se_reduction: int = 0            # senet.py's SE path when > 0
    name_str: str = "ResNet"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.depth not in _ARCH:
            raise KeyError(f"invalid depth {self.depth} for resnet")
        kind, blocks = _ARCH[self.depth]
        blocks = blocks[:self.num_stages]
        # BN in a frozen/eval stage uses running stats even in train mode
        # (reference norm_eval / _freeze_stages, resnet.py:498-516)
        stem_train = train and self.frozen_stages < 0 and not self.norm_eval
        x = _conv(64, 7, 2)(x)
        x = build_norm(self.norm_cfg)(x, use_running_average=not stem_train)
        x = nn.relu(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        for i, n in enumerate(blocks):
            st_train = (train and i + 1 > self.frozen_stages
                        and not self.norm_eval)
            for j in range(n):
                stride = self.strides[i] if j == 0 else 1
                common = dict(planes=planes, stride=stride,
                              dilation=self.dilations[i],
                              downsample=(j == 0), norm_cfg=self.norm_cfg)
                if kind == "basic":
                    x = BasicBlock(**common)(x, train=st_train)
                else:
                    x = Bottleneck(style=self.style, groups=self.groups,
                                   se_reduction=self.se_reduction,
                                   **common)(x, train=st_train)
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)


@BACKBONES.register_module
class SENet(nn.Module):
    """senet.py — squeeze-excitation ResNet: the reference's SENet is the
    Hu et al. stack; functionally ResNet-with-SE(-ResNeXt) here, sharing
    the block implementation (se_reduction wires the SE branch, groups > 1
    gives the ResNeXt variants)."""
    depth: int = 50
    groups: int = 1
    reduction: int = 16
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    norm_cfg: Optional[dict] = None
    name_str: str = "SENet"

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ResNet(depth=self.depth, num_stages=self.num_stages,
                      strides=self.strides, dilations=self.dilations,
                      out_indices=self.out_indices, norm_cfg=self.norm_cfg,
                      norm_eval=False, groups=self.groups,
                      se_reduction=self.reduction,
                      frozen_stages=-1)(x, train=train)


def _max_pool_ceil(x, window, stride):
    """torch MaxPool2d(ceil_mode=True): pad bottom/right so every input
    pixel lands in some window (ssd_vgg.py:29-38 uses it at pool3)."""
    h, w = x.shape[1:3]
    ph = (-(h - window) % stride) if h > window else 0
    pw = (-(w - window) % stride) if w > window else 0
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((0, ph), (0, pw)))


_VGG_CFG = {  # channels per conv layer, "M" = pool (vgg.py arch for depth 16)
    16: (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
         512, 512, 512, "M", 512, 512, 512),
}

_SSD_EXTRA = {  # ssd_vgg.py:14-17
    300: (256, "S", 512, 128, "S", 256, 128, 256, 128, 256),
    512: (256, "S", 512, 128, "S", 256, 128, "S", 256, 128, "S", 256, 128),
}


class L2Norm(nn.Module):
    """ssd_vgg.py:120-135: per-channel-scaled L2 normalization."""
    scale: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.scale),
                           (x.shape[-1],))
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + self.eps
        return gamma * x / norm


@BACKBONES.register_module
class SSDVGG(nn.Module):
    """ssd_vgg.py:13-118: VGG-16 trunk (ceil-mode pool3, stride-1 pool5 +
    dilated fc6/fc7 convs) with the SSD extra pyramid; returns the two VGG
    taps (conv4_3 through L2Norm, fc7) plus every second extra layer."""
    input_size: int = 300
    depth: int = 16
    l2_norm_scale: float = 20.0
    name_str: str = "SSDVGG"

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.input_size in _SSD_EXTRA
        outs = []
        conv_i = 0
        pool_i = 0
        for v in _VGG_CFG[self.depth]:
            if v == "M":
                pool_i += 1
                if pool_i == 5:
                    x = nn.max_pool(x, (3, 3), strides=(1, 1),
                                    padding=((1, 1), (1, 1)))
                else:
                    x = _max_pool_ceil(x, 2, 2)
            else:
                x = nn.relu(nn.Conv(v, (3, 3), padding="SAME")(x))
                conv_i += 1
                if conv_i == 10:                    # conv4_3 tap
                    outs.append(L2Norm(self.l2_norm_scale)(x))
        if pool_i == 4:                             # with_last_pool=False
            x = nn.max_pool(x, (3, 3), strides=(1, 1),
                            padding=((1, 1), (1, 1)))
        # fc6/fc7 as dilated convs (ssd_vgg.py:39-47)
        x = nn.relu(nn.Conv(1024, (3, 3), kernel_dilation=(6, 6),
                            padding=[(6, 6), (6, 6)])(x))
        x = nn.relu(nn.Conv(1024, (1, 1))(x))
        outs.append(x)

        # extra pyramid (_make_extra_layers, ssd_vgg.py:95-117): kernels
        # alternate 1/3 by layer index; "S" marks a stride-2 pad-1 layer
        # whose outplane is the NEXT entry (which is then skipped); plain
        # layers are stride-1 VALID. Forward taps every odd layer (:85-88).
        cfg = _SSD_EXTRA[self.input_size]
        specs = []                      # (outplane, kernel, stride, pad)
        i = 0
        while i < len(cfg):
            k = 1 if len(specs) % 2 == 0 else 3
            if cfg[i] == "S":
                specs.append((cfg[i + 1], k, 2, 1))
                i += 2
            else:
                specs.append((cfg[i], k, 1, 0))
                i += 1
        if self.input_size == 512:      # trailing 4x4 pad-1 conv (:113)
            specs.append((256, 4, 1, 1))
        for li, (f, k, s, p) in enumerate(specs):
            x = nn.relu(nn.Conv(f, (k, k), strides=(s, s),
                                padding=[(p, p), (p, p)])(x))
            if li % 2 == 1:
                outs.append(x)
        return tuple(outs)


@NECKS.register_module
class FPN(nn.Module):
    """necks/fpn.py:11-144: lateral 1x1 + nearest top-down + 3x3 smooth,
    optional extra levels (stride-2 convs on the last input or output)."""
    in_channels: Sequence[int]
    out_channels: int
    num_outs: int
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    extra_convs_on_inputs: bool = True
    relu_before_extra_convs: bool = False
    name_str: str = "FPN"

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        end = (len(self.in_channels) if self.end_level == -1
               else self.end_level)
        used = list(inputs[self.start_level:end])

        laterals = [nn.Conv(self.out_channels, (1, 1),
                            name=f"lateral{i}")(x)
                    for i, x in enumerate(used)]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(laterals[i],
                                  laterals[i - 1].shape[:1]
                                  + laterals[i - 1].shape[1:3]
                                  + laterals[i].shape[3:],
                                  method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        name=f"fpn{i}")(x)
                for i, x in enumerate(laterals)]

        if self.num_outs > len(outs):
            if not self.add_extra_convs:        # max-pool extras (fpn.py:99)
                while len(outs) < self.num_outs:
                    outs.append(nn.max_pool(outs[-1], (1, 1),
                                            strides=(2, 2)))
            else:
                src = (inputs[end - 1] if self.extra_convs_on_inputs
                       else outs[-1])
                for i in range(self.num_outs - len(outs)):
                    if i > 0 and self.relu_before_extra_convs:
                        src = nn.relu(src)
                    src = nn.Conv(self.out_channels, (3, 3),
                                  strides=(2, 2), padding=[(1, 1), (1, 1)],
                                  name=f"extra{i}")(src)
                    outs.append(src)
        return tuple(outs)
