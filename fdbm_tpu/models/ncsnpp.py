"""NCSN++ (score-SDE U-Net) backbone in Flax, TPU-first.

Behavioural spec: reference fdbm/backbones/ncsnpp_v2.py (adapted from
yang-song/score_sde) with BigGAN residual blocks, FIR [1,3,3,1] resampling,
progressive `output_skip` / `input_skip` pyramids with 'sum' combining, and
channel-wise attention at configured resolutions
(reference: ncsnpp_v2.py:48-401, ncsnpp_utils/layerspp.py).

TPU-native design:
* channel-last NHWC convolutions (XLA's fast conv layout);
* FIR resampling is one depthwise `conv_general_dilated` (ops/upfirdn2d.py)
  instead of the reference's custom CUDA kernel — autodiff provides the
  backward pass;
* the module-list walk (ncsnpp_v2.py:241-401) is replaced by a structured
  compact module: explicit down path / bottleneck / up path loops with
  named submodules (stable checkpoint layout);
* spectrogram quirks preserved: 257-bin inputs are sliced to 256 on entry
  and a zero row is re-appended on exit (ncsnpp_v2.py:249-250, 398-399).

Variants registered: ncsnpp_v2 (37M-class default), ncsnpp_v2_5M/16M/37M,
and *_predictive twins (2 input channels, no time embedding;
reference fdbm/backbones/ncsnpp_v2_predictive.py).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fdbm_tpu.models import BackboneRegistry
from fdbm_tpu.models.layers import GaussianFourierProjection
from fdbm_tpu.ops.upfirdn2d import downsample_2d, upsample_2d

Array = jnp.ndarray
Dtype = Any

FIR_KERNEL = (1, 3, 3, 1)


def default_init(scale: float = 1.0):
    """variance_scaling(scale, fan_avg, uniform) — the score-SDE init
    (reference ncsnpp_utils/layers.py:54-91); scale==0 uses 1e-10."""
    return nn.initializers.variance_scaling(
        max(scale, 1e-10), "fan_avg", "uniform")


def _gn_groups(ch: int) -> int:
    return min(max(ch // 4, 1), 32)


class GroupNormAct(nn.Module):
    """Drop-in ``nn.GroupNorm`` (identical param tree: scale/bias) with
    fp32 statistics computed via group-indicator MXU dots and the
    follow-on SiLU + output cast FUSED into the normalise pass.

    Why: flax GroupNorm's reshaped [.., G, C/G] stats view has a tiny
    minor dim (C/G = 4) that is 32x lane-padded on TPU, and the separate
    ``act(h).astype(dtype)`` pass re-reads and re-writes the whole
    feature map — device-profiled at ~570 ms (28%) of the 2.0 s
    batch-16 N=30 NCSN++ enhance program. An indicator-matrix dot
    ([B*HW, C] x [C, G]) computes the same per-group sums with no
    padded view, and variance uses the same E[x^2]-mu^2 form flax does.
    """

    num_groups: int
    epsilon: float = 1e-6
    act: bool = False
    out_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        g = self.num_groups
        cg = c // g
        assert g * cg == c, "channels must divide into groups"
        x32 = x.astype(jnp.float32)
        spatial = int(np.prod(x.shape[1:-1]))
        xf = x32.reshape(x.shape[0], spatial, c)
        ind = jnp.asarray(np.kron(np.eye(g, dtype=np.float32),
                                  np.ones((cg, 1), np.float32)))  # [C, G]
        hi = jax.lax.Precision.HIGHEST
        s1 = jnp.einsum("bnc,cg->bg", xf, ind, precision=hi)
        s2 = jnp.einsum("bnc,cg->bg", xf * xf, ind, precision=hi)
        n = spatial * cg
        mu = s1 / n
        var = jnp.maximum(s2 / n - mu * mu, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        # broadcast per-group stats back to per-channel lanes (tiny dots)
        mu_c = jnp.einsum("bg,cg->bc", mu, ind, precision=hi)
        inv_c = jnp.einsum("bg,cg->bc", inv, ind, precision=hi)
        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        h = ((x32 - mu_c.reshape(bshape)) * inv_c.reshape(bshape)
             * scale + bias)
        if self.act:
            h = h * jax.nn.sigmoid(h)  # SiLU, fused into the same pass
        return h.astype(self.out_dtype)


class AttnBlock(nn.Module):
    """Channel-wise self-attention over all spatial positions
    (reference layerspp.py:62-91)."""

    channels: int
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        g = GroupNormAct(num_groups=_gn_groups(c), epsilon=1e-6,
                         out_dtype=self.dtype, name="norm")(x)
        q = nn.Dense(c, kernel_init=default_init(), dtype=self.dtype, name="q")(g)
        k = nn.Dense(c, kernel_init=default_init(), dtype=self.dtype, name="k")(g)
        v = nn.Dense(c, kernel_init=default_init(), dtype=self.dtype, name="v")(g)
        qf = q.reshape(b, h * w, c)
        kf = k.reshape(b, h * w, c)
        vf = v.reshape(b, h * w, c)
        attn = jnp.einsum("bqc,bkc->bqk", qf, kf) * (c ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, vf).reshape(b, h, w, c)
        out = nn.Dense(c, kernel_init=default_init(self.init_scale),
                       dtype=self.dtype, name="proj")(out)
        res = x + out
        return res / np.sqrt(2.0) if self.skip_rescale else res


class ResnetBlockBigGAN(nn.Module):
    """BigGAN residual block with optional FIR up/down
    (reference layerspp.py:212-274)."""

    in_ch: int
    out_ch: int
    temb_dim: int = 0
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Array = None, train: bool = False) -> Array:
        act = nn.swish
        h = GroupNormAct(num_groups=_gn_groups(self.in_ch), epsilon=1e-6,
                         act=True, out_dtype=self.dtype, name="gn0")(x)

        if self.up:
            h = upsample_2d(h, FIR_KERNEL, factor=2)
            x = upsample_2d(x, FIR_KERNEL, factor=2)
        elif self.down:
            h = downsample_2d(h, FIR_KERNEL, factor=2)
            x = downsample_2d(x, FIR_KERNEL, factor=2)

        h = nn.Conv(self.out_ch, (3, 3), padding="SAME",
                    kernel_init=default_init(), dtype=self.dtype, name="conv0")(h)
        if temb is not None:
            bias = nn.Dense(self.out_ch, kernel_init=default_init(),
                            dtype=self.dtype, name="temb_proj")(act(temb))
            h = h + bias[:, None, None, :]
        h = GroupNormAct(num_groups=_gn_groups(self.out_ch), epsilon=1e-6,
                         act=True, out_dtype=self.dtype, name="gn1")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME",
                    kernel_init=default_init(self.init_scale),
                    dtype=self.dtype, name="conv1")(h)

        if self.in_ch != self.out_ch or self.up or self.down:
            x = nn.Dense(self.out_ch, kernel_init=default_init(),
                         dtype=self.dtype, name="shortcut")(x)

        res = x + h
        return res / np.sqrt(2.0) if self.skip_rescale else res


class NCSNpp(nn.Module):
    """NCSN++ v2: BigGAN blocks, FIR resampling, output_skip/input_skip
    pyramids ('sum' combine), Fourier time embedding on log(t)."""

    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    image_size: int = 256
    fourier_scale: float = 16.0
    dropout: float = 0.0
    skip_rescale: bool = True
    init_scale: float = 0.0
    time_conditioned: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, y: Array, t: Array = None) -> Array:
        """x, y: complex [B, 1, F, T]; t: [B]. Returns complex [B, 1, F, T]."""
        act = nn.swish
        nf = self.nf
        num_resolutions = len(self.ch_mult)
        all_res = [self.image_size // (2 ** i) for i in range(num_resolutions)]

        if self.time_conditioned:
            chans = [jnp.real(x), jnp.imag(x), jnp.real(y), jnp.imag(y)]
        else:
            chans = [jnp.real(y), jnp.imag(y)]
        # [B,1,F,T] -> [B, F, T, C_in] (freq = H, frames = W)
        inp = jnp.stack([ch[:, 0] for ch in chans], axis=-1).astype(self.dtype)
        orig_f = inp.shape[1]
        # Slice the odd (Nyquist) bin so freq is a power-of-2 multiple; the
        # reference hardcodes 257->256 (ncsnpp_v2.py:249-250) — generalised
        # to any odd onesided bin count.
        if orig_f % 2 == 1:
            inp = inp[:, : orig_f - 1]
        channels = inp.shape[-1]

        # ---- time embedding ------------------------------------------------
        temb = None
        if self.time_conditioned:
            temb = GaussianFourierProjection(
                embedding_size=nf, scale=self.fourier_scale, name="time_emb"
            )(jnp.log(t)).astype(self.dtype)
            temb = nn.Dense(nf * 4, kernel_init=default_init(),
                            dtype=self.dtype, name="time_fc0")(temb)
            temb = nn.Dense(nf * 4, kernel_init=default_init(),
                            dtype=self.dtype, name="time_fc1")(act(temb))

        def resblock(name, in_ch, out_ch=None, up=False, down=False):
            return ResnetBlockBigGAN(
                in_ch=in_ch, out_ch=out_ch or in_ch,
                temb_dim=nf * 4 if temb is not None else 0,
                up=up, down=down, dropout=self.dropout,
                skip_rescale=self.skip_rescale, init_scale=self.init_scale,
                dtype=self.dtype, name=name)

        def attnblock(name, ch):
            return AttnBlock(channels=ch, skip_rescale=self.skip_rescale,
                             init_scale=self.init_scale, dtype=self.dtype,
                             name=name)

        # ---- down path -----------------------------------------------------
        input_pyramid = inp
        hs = [nn.Conv(nf, (3, 3), padding="SAME", kernel_init=default_init(),
                      dtype=self.dtype, name="conv_in")(inp)]
        hs_ch = [nf]
        in_ch = nf
        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                out_ch = nf * self.ch_mult[i_level]
                h = resblock(f"down_{i_level}_{i_block}", in_ch, out_ch)(hs[-1], temb)
                in_ch = out_ch
                if h.shape[1] in self.attn_resolutions:
                    h = attnblock(f"down_attn_{i_level}_{i_block}", in_ch)(h)
                hs.append(h)
                hs_ch.append(in_ch)
            if i_level != num_resolutions - 1:
                h = resblock(f"down_{i_level}_ds", in_ch, down=True)(hs[-1], temb)
                # input_skip: FIR-downsample the raw input and sum-combine
                # via a 1x1 conv (layerspp.py:44-59, 'sum' method)
                input_pyramid = downsample_2d(input_pyramid, FIR_KERNEL, factor=2)
                comb = nn.Dense(in_ch, kernel_init=default_init(),
                                dtype=self.dtype,
                                name=f"combine_{i_level}")(input_pyramid)
                h = comb + h
                hs.append(h)
                hs_ch.append(in_ch)

        # ---- bottleneck ------------------------------------------------------
        h = hs[-1]
        h = resblock("mid_0", in_ch)(h, temb)
        h = attnblock("mid_attn", in_ch)(h)
        h = resblock("mid_1", in_ch)(h, temb)

        # ---- up path ---------------------------------------------------------
        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                out_ch = nf * self.ch_mult[i_level]
                skip = hs.pop()
                skip_ch = hs_ch.pop()
                h = resblock(f"up_{i_level}_{i_block}", in_ch + skip_ch, out_ch)(
                    jnp.concatenate([h, skip], axis=-1), temb)
                in_ch = out_ch
            if h.shape[1] in self.attn_resolutions:
                h = attnblock(f"up_attn_{i_level}", in_ch)(h)

            # progressive output_skip pyramid (ncsnpp_v2.py:338-359)
            gn = GroupNormAct(num_groups=_gn_groups(in_ch), epsilon=1e-6,
                              act=True, out_dtype=self.dtype,
                              name=f"pyr_gn_{i_level}")
            conv = nn.Conv(channels, (3, 3), padding="SAME",
                           kernel_init=default_init(self.init_scale),
                           dtype=self.dtype, name=f"pyr_conv_{i_level}")
            pyr_h = conv(gn(h))
            if i_level == num_resolutions - 1:
                pyramid = pyr_h
            else:
                pyramid = upsample_2d(pyramid, FIR_KERNEL, factor=2) + pyr_h

            if i_level != 0:
                h = resblock(f"up_{i_level}_us", in_ch, up=True)(h, temb)

        assert not hs

        h = pyramid.astype(jnp.float32)
        # final 1x1: channels -> 2 (score.re, score.im)  (ncsnpp_v2.py:93,392)
        h = nn.Dense(2, name="output_layer")(h)
        out = jax.lax.complex(h[..., 0], h[..., 1])  # [B, F, T]
        if orig_f % 2 == 1:
            out = jnp.concatenate(
                [out, jnp.zeros_like(out[:, :1])], axis=1)  # re-append zero row
        return out[:, None]  # [B, 1, F, T]


# ---------------------------------------------------------------------------
# Registered variants (reference names, ncsnpp_v2.py:36,404-453)
# ---------------------------------------------------------------------------


@BackboneRegistry.register("ncsnpp_v2")
def ncsnpp_v2(**kwargs):
    return NCSNpp(dtype=kwargs.get("dtype", jnp.float32))


@BackboneRegistry.register("ncsnpp_v2_5M")
def ncsnpp_v2_5m(**kwargs):
    return NCSNpp(nf=96, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
                  attn_resolutions=(0,), dtype=kwargs.get("dtype", jnp.float32))


@BackboneRegistry.register("ncsnpp_v2_16M")
def ncsnpp_v2_16m(**kwargs):
    return NCSNpp(nf=64, ch_mult=(1, 1, 2, 2, 2, 2, 2), num_res_blocks=2,
                  attn_resolutions=(0,), dtype=kwargs.get("dtype", jnp.float32))


@BackboneRegistry.register("ncsnpp_v2_37M")
def ncsnpp_v2_37m(**kwargs):
    return NCSNpp(nf=96, ch_mult=(1, 1, 2, 2, 2, 2, 2), num_res_blocks=2,
                  attn_resolutions=(16,), dtype=kwargs.get("dtype", jnp.float32))


@BackboneRegistry.register("ncsnpp_v2_predictive")
def ncsnpp_v2_predictive(**kwargs):
    return NCSNpp(time_conditioned=False, dtype=kwargs.get("dtype", jnp.float32))


@BackboneRegistry.register("ncsnpp_v2_5M_predictive")
def ncsnpp_v2_5m_predictive(**kwargs):
    return NCSNpp(nf=96, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
                  attn_resolutions=(0,), time_conditioned=False,
                  dtype=kwargs.get("dtype", jnp.float32))
