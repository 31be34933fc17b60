"""IMDN_RTC / LeRF-Net (IMDN2) in Flax.

Reference: ``resample/model.py:475-537`` — the lightweight information
multi-distillation network used as the LeRF-Net / LeRF-Net++ hyper-parameter
predictor.  stage1 (feature/pre-filter) maps C→C, stage2 (hyper) maps
C→C·outC; both run at input resolution (upscale=1).

TPU notes: NHWC layout (XLA's native conv layout on TPU), 3×3 SAME convs in
bfloat16-friendly form; channel split/concat fuses into the surrounding
convs.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.05)


class IMDModuleSpeed(nn.Module):
    """IMDModule_speed (model.py:480-503): 3 distillation steps + 1×1 fuse
    with residual."""
    channels: int
    distillation_rate: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dc = int(self.channels * self.distillation_rate)
        rc = self.channels - dc
        c1 = lrelu(nn.Conv(self.channels, (3, 3), dtype=self.dtype,
                           name="c1")(x))
        d1, r1 = c1[..., :dc], c1[..., dc:]
        c2 = lrelu(nn.Conv(self.channels, (3, 3), dtype=self.dtype,
                           name="c2")(r1))
        d2, r2 = c2[..., :dc], c2[..., dc:]
        c3 = lrelu(nn.Conv(self.channels, (3, 3), dtype=self.dtype,
                           name="c3")(r2))
        d3, r3 = c3[..., :dc], c3[..., dc:]
        c4 = nn.Conv(dc, (3, 3), dtype=self.dtype, name="c4")(r3)
        out = jnp.concatenate([d1, d2, d3, c4], axis=-1)
        return nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                       name="c5")(out) + x


class IMDN_RTC(nn.Module):
    """IMDN_RTC (model.py:507-523): fea_conv → shortcut(5×IMD + 1×1) →
    pixelshuffle head.  NHWC."""
    in_nc: int = 3
    nf: int = 12
    num_modules: int = 5
    out_nc: int = 3
    upscale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.nf, (3, 3), dtype=self.dtype, name="fea")(x)
        r = h
        for i in range(self.num_modules):
            r = IMDModuleSpeed(self.nf, dtype=self.dtype, name=f"imd{i}")(r)
        r = nn.Conv(self.nf, (1, 1), dtype=self.dtype, name="lr")(r)
        h = h + r
        up = nn.Conv(self.out_nc * self.upscale ** 2, (3, 3),
                     dtype=self.dtype, name="up")(h)
        if self.upscale > 1:
            b, hh, ww, c = up.shape
            up = up.reshape(b, hh, ww, self.upscale, self.upscale,
                            self.out_nc)
            up = up.transpose(0, 1, 3, 2, 4, 5)
            up = up.reshape(b, hh * self.upscale, ww * self.upscale,
                            self.out_nc)
        return up


class IMDN2(nn.Module):
    """LeRF-Net / LeRF-Net++ (model.py:526-537): stage1 feature net (output
    scaled to [0,255]) + stage2 hyper net (output in [0,1])."""
    in_c: int = 3
    out_c: int = 3
    nf: int = 12
    norm: int = 255
    dtype: Any = jnp.float32

    def setup(self):
        self.stage1 = IMDN_RTC(in_nc=self.in_c, nf=self.nf,
                               out_nc=self.in_c, upscale=1, dtype=self.dtype)
        self.stage2 = IMDN_RTC(in_nc=self.in_c, nf=self.nf,
                               out_nc=self.in_c * self.out_c, upscale=1,
                               dtype=self.dtype)

    def predict(self, x, stage: int = 1):
        """x: NHWC in [0,1].  stage1 → [0,255] feature; stage2 → [0,1] hyper.

        ``stage=0`` runs both towers (used only to initialize all params).
        """
        half = self.norm // 2
        if stage == 0:
            return self.stage1(x), self.stage2(x)
        if stage == 2:
            return jnp.clip(self.stage2(x), -1, 1) / 2 + 0.5
        return jnp.clip(self.stage1(x), -1, 1) * half + half

    def __call__(self, x, stage: int = 1):
        return self.predict(x, stage)
