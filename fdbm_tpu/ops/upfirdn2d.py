"""upfirdn2d: upsample -> FIR filter -> downsample, as one XLA convolution.

TPU-native replacement for the reference CUDA kernel
(fdbm/backbones/ncsnpp_utils/op/upfirdn2d_kernel.cu) and its python
fallback `upfirdn2d_native` (op/upfirdn2d.py:162-203), which define the
semantics we match:

    1. zero-stuff the input by `up` along H and W,
    2. pad by (pad0, pad1) on each spatial dim (negative pad = crop),
    3. correlate with the *flipped* kernel (== true convolution),
    4. subsample by `down`.

A single `lax.conv_general_dilated` expresses all four stages
(lhs_dilation = up, padding, window_strides = down) with the kernel
applied depthwise via feature_group_count, so XLA fuses it into one
TPU convolution — the gradient comes from JAX autodiff for free (the
reference hand-derives forward/backward CUDA kernels).

Channel-last layout ([B, H, W, C]) throughout — the framework's native
conv layout on TPU.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def setup_fir_kernel(k: Union[Sequence[float], np.ndarray], gain: float = 1.0) -> np.ndarray:
    """Normalise a 1-D (separable) or 2-D FIR kernel
    (reference up_or_down_sampling.py:181-188)."""
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return (k * gain).astype(np.float32)


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """x: [B, H, W, C]; kernel: [kh, kw]. Returns [B, H', W', C] with
    H' = (H*up + pad0 + pad1 - kh)//down + 1."""
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad

    # Flipped kernel (stage 3), depthwise across C.
    k = jnp.flip(jnp.asarray(kernel, x.dtype))
    rhs = k.reshape(kh, kw, 1, 1)
    rhs = jnp.tile(rhs, (1, 1, 1, c))  # HWIO with I=1 per group

    # lhs_dilation yields (H-1)*up + 1 samples (no trailing zeros); the
    # reference zero-stuffs to H*up, so add the missing up-1 high zeros.
    hi = pad1 + (up - 1)
    out = jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(down, down),
        padding=((pad0, hi), (pad0, hi)),
        lhs_dilation=(up, up),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def upsample_2d(x: jnp.ndarray, k: Sequence[float] = (1, 3, 3, 1),
                factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """FIR upsample by `factor` (reference up_or_down_sampling.py:195-224):
    kernel scaled by gain*factor^2, pad ((p+1)//2 + factor - 1, p//2)."""
    kern = setup_fir_kernel(k, gain * (factor ** 2))
    p = kern.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(kern), up=factor,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: jnp.ndarray, k: Sequence[float] = (1, 3, 3, 1),
                  factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """FIR downsample by `factor` (reference up_or_down_sampling.py:227-257):
    pad ((p+1)//2, p//2)."""
    kern = setup_fir_kernel(k, gain)
    p = kern.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(kern), down=factor,
                     pad=((p + 1) // 2, p // 2))


def naive_upsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h, 1, w, 1, c)
    x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
    return x.reshape(b, h * factor, w * factor, c)


def naive_downsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return jnp.mean(x, axis=(2, 4))
