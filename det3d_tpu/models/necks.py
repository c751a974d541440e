"""RPN neck: multi-stage conv trunk with upsample branches.

Parity: reference det3d/models/necks/rpn.py:23-159 — per stage, a stride-s
3x3 conv (the reference's ZeroPad2d(1)+valid-conv == SAME-style padding 1)
followed by ``layer_num`` 3x3 convs, each conv + BN + ReLU; each stage from
``upsample_start_idx`` feeds a (transposed-)conv upsample branch, and the
branch outputs concatenate on channels. NHWC layout throughout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from det3d_tpu.models.norm import build_norm
from det3d_tpu.models.precision import act_dtype
from det3d_tpu.models.registry import NECKS


@NECKS.register_module
class RPN(nn.Module):
    layer_nums: Sequence[int] = (3, 5, 5)
    ds_layer_strides: Sequence[int] = (2, 2, 2)
    ds_num_filters: Sequence[int] = (64, 128, 256)
    us_layer_strides: Sequence[int] = (1, 2, 4)
    us_num_filters: Sequence[int] = (128, 128, 128)
    num_input_features: int = 64
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    precision: str = "fp32"
    name_str: str = "rpn"
    logger: Optional[object] = None

    @property
    def downsample_factor(self) -> float:
        factor = int(np.prod(self.ds_layer_strides))
        if len(self.us_layer_strides) > 0:
            factor /= self.us_layer_strides[-1]
        return factor

    def _conv_bn_relu(self, x, features, stride, train, prefix):
        dt = act_dtype(self.precision)
        x = nn.Conv(features, (3, 3), strides=(stride, stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=dt,
                    name=f"{prefix}_conv")(x)
        x = build_norm(self.norm_cfg, axis_name=self.axis_name, dtype=dt)(
            x, use_running_average=not train)
        return nn.relu(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = act_dtype(self.precision)
        x = x.astype(dt)
        us_start = len(self.layer_nums) - len(self.us_layer_strides)
        ups = []
        for i, num_blocks in enumerate(self.layer_nums):
            x = self._conv_bn_relu(
                x, self.ds_num_filters[i], self.ds_layer_strides[i], train,
                prefix=f"block{i}_down")
            for j in range(num_blocks):
                x = self._conv_bn_relu(
                    x, self.ds_num_filters[i], 1, train,
                    prefix=f"block{i}_conv{j}")
            k = i - us_start
            if k >= 0:
                stride = self.us_layer_strides[k]
                if stride > 1:
                    u = nn.ConvTranspose(
                        self.us_num_filters[k], (stride, stride),
                        strides=(stride, stride), padding="VALID", dtype=dt,
                        use_bias=False, name=f"deblock{k}_deconv")(x)
                else:
                    s = int(np.round(1 / stride))
                    u = nn.Conv(
                        self.us_num_filters[k], (s, s), strides=(s, s),
                        padding="VALID", use_bias=False, dtype=dt,
                        name=f"deblock{k}_conv")(x)
                u = build_norm(self.norm_cfg, axis_name=self.axis_name,
                               dtype=dt)(u, use_running_average=not train)
                ups.append(nn.relu(u))
        if ups:
            x = jnp.concatenate(ups, axis=-1)
        return x


@NECKS.register_module
class PointModule(nn.Module):
    """Per-crop pointnet head for the 2-stage refine path (rpn.py:163-201):
    flatten, two 1x1-conv(Dense)+BN+ReLU blocks, then a width-3 max filter
    over the feature vector (the reference's MaxPool1d(3, 1, 1))."""
    num_input_features: int
    layers: Sequence[int] = (1024, 128)
    norm_cfg: Optional[dict] = None
    name_str: str = "PointModule"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)                      # (N, F)
        for f in self.layers:
            x = nn.Dense(f, use_bias=False)(x)
            x = build_norm(self.norm_cfg)(
                x, use_running_average=not train)
            x = nn.relu(x)
        pad = jnp.pad(x, ((0, 0), (1, 1)), constant_values=-jnp.inf)
        x = jnp.maximum(jnp.maximum(pad[:, :-2], pad[:, 1:-1]), pad[:, 2:])
        return x[:, None, None, :]                         # (N, 1, 1, F)
