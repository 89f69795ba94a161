"""TF-GridNet (V3) backbone in Flax, TPU-first.

Behavioural spec is the reference fdbm/backbones/tfgridnet.py (TFGridNetV3,
Wang et al. TASLP 2023): per-block intra-frequency BiLSTM, inter-frame
BiLSTM, full-band frame self-attention, with a per-block additive FiLM bias
from a Gaussian-Fourier time embedding of log(t)
(reference: tfgridnet.py:126-229, 236-427).

TPU-native design decisions (not a translation):
* channel-last layout [B, T, Q, C] so convs hit XLA's NHWC fast path;
* the unfold(k=4,s=1) -> BiLSTM -> ConvTranspose1d pipeline is expressed as
  4 shifted slices -> batched scan LSTM -> dense + 4-way shift-add fold, all
  static-shape ops XLA fuses well (no gather/scatter);
* both LSTM directions run in one `lax.scan` with the input projection
  hoisted into a single MXU matmul (see layers.BiLSTM);
* frame attention is two batched matmuls over [B*H, T, E*Q] — MXU-shaped.

Variants registered (reference names): tfgridnet_5l32c100 (default),
tfgridnet_4l32c80, and the *_predictive twins (no time embedding, input y
only; reference fdbm/backbones/tfgridnet_predictive.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fdbm_tpu.models import BackboneRegistry
from fdbm_tpu.models.layers import BiLSTM, GaussianFourierProjection, PReLU, layer_norm_f32

Array = jnp.ndarray
Dtype = Any

_OLP_KS = 4  # emb_ks
_OLP_HS = 1  # emb_hs


class _DenseKernel(nn.Module):
    """Param-only twin of ``nn.Dense(features, use_bias=False)``.

    Creates the identical ``kernel`` parameter (same name, shape, init) so
    the fused-kernel path owns the same checkpoint tree as the Dense it
    replaces; returns the kernel value instead of computing the matmul.
    """

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> Array:
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features))


def _pallas_fast_path_ok(c: int, hidden: int) -> bool:
    """Gate for the canvas-direct Pallas kernel dispatch.

    The kernel's VMEM sizing (default tile 88, ops/gridrnn.py:_pick_tile)
    is validated for C <= 64 and H <= 128: at those sizes the two
    directions' chunk projections + scratch fit the 16 MB scoped-VMEM
    stack. A larger emb_dim/hidden variant falls back to the XLA path
    instead of risking a VMEM failure at compile time on real hardware.
    Both _RnnPath and GridNetBlock must use this same predicate so the
    canvas orientation and the kernel dispatch stay in agreement."""
    return c % 8 == 0 and c <= 64 and hidden <= 128


def _attn_fast_path_ok(c: int, t_len: int, q_bins: int, e: int,
                       n_head: int, io_bytes: int = 2,
                       fused_norms: bool = False) -> bool:
    """Gate for the fused frame-attention kernel (ops/attention.py).

    Delegates to the kernel's own VMEM estimator (`fast_path_ok`), which
    sizes K/V residency, the query tile ladder, and the fp32 score
    scratch against the 16 MB scoped-VMEM stack — so the gate and the
    kernel's tile chooser can never disagree about what fits (the
    round-3 folder sweep caught exactly that disagreement: a guard pass
    followed by a 17.14 MB compile-time VMEM OOM at the 8 s bucket)."""
    from fdbm_tpu.ops.attention import fast_path_ok

    return fast_path_ok(c, t_len, q_bins, e, n_head, io_bytes, fused_norms)


class _RnnPath(nn.Module):
    """One intra- or inter- RNN path: LN -> unfold -> BiLSTM -> fold -> +res.

    Operates over axis ``seq_axis`` of ``[B, T, Q, C]`` (2 = intra/freq,
    1 = inter/time). Input is assumed already padded by olp=3 on both
    spatial axes.
    """

    emb_dim: int
    hidden: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_train: bool = False

    @nn.compact
    def __call__(self, x: Array, seq_axis: int) -> Array:
        c = self.emb_dim
        ks = _OLP_KS
        residual = x
        # LayerNorm over channel (torch nn.LayerNorm(emb_dim))
        gamma = self.param("ln_gamma", nn.initializers.ones, (c,))
        beta = self.param("ln_beta", nn.initializers.zeros, (c,))

        # use_pallas_train takes priority over use_pallas: the inference
        # kernel has no autodiff rule, so a config enabling both flags must
        # route through the differentiable train kernel (ADVICE r4).
        if (self.use_pallas and not self.use_pallas_train
                and _pallas_fast_path_ok(c, self.hidden)):
            # Inference fast path: ONE canvas-direct Pallas kernel runs
            # unfold -> BiLSTM -> deconv -> overlap-add, reading the 4D
            # canvas directly through BlockSpec index maps (sequence on
            # axis 1) — no reshape/transpose copies around the kernel
            # (they were ~2s of the 5.7s 30-step enhance; BENCH_NOTES
            # round-2b). GridNetBlock orients the canvas so seq_axis is 1
            # on this path; a seq_axis=2 call transposes here (2 copies —
            # only the generic/test entry pays them). LN / residual /
            # deconv-bias stay outside as fused XLA elementwise passes.
            # The kernel's out-of-crop rows (0..2 and L..seq-1 along the
            # sequence axis) carry pad contamination — GridNetBlock's olp
            # crop discards exactly those rows (tests/test_gridrnn.py).
            from fdbm_tpu.ops.gridrnn import grid_rnn_seq1_pair

            w_ih, w_hh, bias_l = BiLSTM(
                hidden=self.hidden, dtype=self.dtype, use_pallas=True,
                name="bilstm")(None, in_features=ks * c, return_params=True)
            wd = _DenseKernel(ks * c, name="deconv")(2 * self.hidden)
            d_bias = self.param("deconv_bias", nn.initializers.zeros, (c,))
            h = layer_norm_f32(x, gamma, beta, axis=-1)
            if seq_axis == 2:
                h = jnp.swapaxes(h, 1, 2)
            # Directional sum + deconv bias + residual in ONE elementwise
            # pass (the pair return keeps XLA from materialising a
            # separate outf+outb canvas; device-profiled ~0.7 ms/forward).
            outf, outb = grid_rnn_seq1_pair(
                h.astype(self.dtype), w_ih, w_hh, bias_l, wd)
            if seq_axis == 2:
                outf = jnp.swapaxes(outf, 1, 2)
                outb = jnp.swapaxes(outb, 1, 2)
            return outf + outb + d_bias.astype(outf.dtype) + residual

        if self.use_pallas_train and _pallas_fast_path_ok(c, self.hidden):
            # Train fast path: the DIFFERENTIABLE fused kernel
            # (ops/gridrnn_train.py, custom VJP with a reverse-sweep
            # backward kernel) replaces unfold-stack + per-direction
            # lstm_core + Dense + fold. The k=4 windows stream
            # ([L, B', 4C], 4x the raw line bytes) and the reshape/
            # transpose copies around the [S, B', D] kernel layout — the
            # ~30% "layout glue" cost in the round-4 train-step profile —
            # all vanish; only two cheap C-wide transposes remain. Same
            # parameter tree as the generic path (BiLSTM + deconv
            # _DenseKernel), so checkpoints are interchangeable.
            from fdbm_tpu.ops.gridrnn_train import grid_fold_train_pair

            w_ih, w_hh, bias_l = BiLSTM(
                hidden=self.hidden, dtype=self.dtype, use_pallas=True,
                name="bilstm")(None, in_features=ks * c, return_params=True)
            wd = _DenseKernel(ks * c, name="deconv")(2 * self.hidden)
            d_bias = self.param("deconv_bias", nn.initializers.zeros, (c,))
            h = layer_norm_f32(x, gamma, beta, axis=-1)
            if seq_axis == 1:
                h = jnp.swapaxes(h, 1, 2)
            bb, other, seq, _ = h.shape
            lines = jnp.swapaxes(h.reshape(bb * other, seq, c), 0, 1)
            outf, outb = grid_fold_train_pair(
                lines.astype(jnp.float32), w_ih, w_hh, bias_l, wd)
            folded = jnp.swapaxes(outf + outb, 0, 1).reshape(bb, other, seq, c)
            folded = (folded + d_bias).astype(x.dtype)
            if seq_axis == 1:
                folded = jnp.swapaxes(folded, 1, 2)
            return folded + residual

        h = layer_norm_f32(x, gamma, beta, axis=-1)

        if seq_axis == 1:  # operate over T: move to [B, Q, T, C]
            h = jnp.swapaxes(h, 1, 2)
        b, other, seq, _ = h.shape
        # Unfold: windows of ks consecutive positions, stride 1 -> L = seq-3
        L = seq - (ks - 1)

        windows = jnp.stack(
            [h[:, :, j : j + L, :] for j in range(ks)], axis=-2)
        # [B, other, L, ks, C] -> [B*other, L, ks*C]
        seqs = windows.reshape(b * other, L, ks * c)

        out = BiLSTM(hidden=self.hidden, dtype=self.dtype,
                     use_pallas=self.use_pallas,
                     use_pallas_train=self.use_pallas_train,
                     name="bilstm")(seqs)

        # ConvTranspose1d(2H -> C, kernel ks, stride 1) == dense to
        # [ks, C] then overlap-add of the ks taps (output length
        # L+ks-1 == seq). The bias is added once per *output position*
        # (ConvTranspose1d semantics), so it lives outside the fold.
        z = nn.Dense(ks * c, dtype=self.dtype, use_bias=False,
                     name="deconv")(out)
        z = z.reshape(b * other, L, ks, c)
        # Overlap-add via pad-and-sum: XLA fuses the ks pads+adds into
        # one elementwise pass; the equivalent `.at[j:j+L].add` scatter
        # chain is ks sequential full-array read/write passes.
        folded = sum(
            jnp.pad(z[:, :, j, :], ((0, 0), (j, ks - 1 - j), (0, 0)))
            for j in range(ks))
        d_bias = self.param("deconv_bias", nn.initializers.zeros, (c,))
        folded = folded + d_bias.astype(folded.dtype)

        folded = folded.reshape(b, other, seq, c)
        if seq_axis == 1:
            folded = jnp.swapaxes(folded, 1, 2)
        return folded + residual


class _AllHeadPReLULayerNorm(nn.Module):
    """PReLU (per-head) + per-(head,E) affine norm over the E axis.

    Input [B, T, Q, H*E] viewed as [..., H, E]; statistics over E only
    (reference tfgridnet.py:458-484 computes mean/var over dim=2 of
    [B,H,E,T,F]).

    ``lane_stats=True`` computes the same statistics WITHOUT leaving the
    flat [B, T, Q, H*E] lane layout: a dot against a block-diagonal
    [C, C] averaging matrix both segment-reduces over each head's E
    lanes and broadcasts the stat back to them. The default path's
    reduce over a minor axis of 2 (q/k) or 8 (v) runs the VPU at 1/64th
    lane utilisation; the dot form keeps the MXU (idle in this program)
    doing the layout work. Same parameters, same math — dispatch is a
    pure perf choice.
    """

    n_head: int
    e_dim: int
    eps: float = 1e-5
    lane_stats: bool = False

    @nn.compact
    def __call__(self, x: Array, return_params: bool = False):
        h, e = self.n_head, self.e_dim
        alpha = self.param("prelu_alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32),
                           (h, 1))
        gamma = self.param("gamma", nn.initializers.ones, (h, e))
        beta = self.param("beta", nn.initializers.zeros, (h, e))
        if return_params:
            # Kernel-fusion path: the caller feeds these (with the RAW
            # projector output) to ops/attention.frame_attention, which
            # applies the identical PReLU + E-norm in VMEM. Same param
            # tree either way (checkpoint/weight-port compatible).
            return alpha, gamma, beta
        b, t, q, _ = x.shape

        if self.lane_stats:
            c = h * e
            al = jnp.repeat(alpha[:, 0], e).astype(x.dtype)  # [C] per-lane
            x = x.reshape(b, t, q, c)
            x = jnp.where(x >= 0, x, al * x)
            x32 = x.astype(jnp.float32)
            # A[i, j] = 1/E iff lanes i, j belong to the same head: one dot
            # = segment-mean over E + broadcast back to the head's lanes.
            lane = np.arange(c)
            blk = jnp.asarray((lane[:, None] // e == lane[None, :] // e)
                              / e, jnp.float32)
            hi = jax.lax.Precision.HIGHEST
            mu = jax.lax.dot_general(
                x32, blk, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            xc = x32 - mu
            var = jax.lax.dot_general(
                xc * xc, blk, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            xh = xc * jax.lax.rsqrt(var + self.eps)
            out = xh * gamma.reshape(c) + beta.reshape(c)
            return out.astype(x.dtype).reshape(b, t, q, h, e)

        x = x.reshape(b, t, q, h, e)
        x = jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        xh = (x32 - mu) * jax.lax.rsqrt(var + self.eps)
        return (xh * gamma + beta).astype(x.dtype)


class GridNetBlock(nn.Module):
    """One TF-GridNet V3 block: intra-RNN, inter-RNN, frame attention."""

    emb_dim: int
    hidden: int
    n_head: int = 4
    qk_output_channel: int = 2
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: [B, T, Q, C]
        b, old_t, old_q, c = x.shape
        olp = _OLP_KS - _OLP_HS  # 3
        h_heads, e = self.n_head, self.qk_output_channel
        d = c // self.n_head

        xp = jnp.pad(x, ((0, 0), (olp, olp), (olp, olp), (0, 0)))
        if self.use_pallas and _pallas_fast_path_ok(c, self.hidden):
            # Canvas-direct kernels want the sequence on axis 1: run intra
            # on the (1,2)-swapped canvas and inter on the swap-back — two
            # canvas transposes per block instead of per-path reshape +
            # transpose copies around each kernel (see _RnnPath).
            xq = jnp.swapaxes(xp, 1, 2)  # [B, Q', T', C], seq = Q on axis 1
            xq = _RnnPath(c, self.hidden, self.dtype, self.use_pallas,
                          self.use_pallas_train, name="intra")(xq, seq_axis=1)
            xt = jnp.swapaxes(xq, 1, 2)  # [B, T', Q', C], seq = T on axis 1
            xp = _RnnPath(c, self.hidden, self.dtype, self.use_pallas,
                          self.use_pallas_train, name="inter")(xt, seq_axis=1)
        else:
            xp = _RnnPath(c, self.hidden, self.dtype, self.use_pallas,
                          self.use_pallas_train, name="intra")(xp, seq_axis=2)
            xp = _RnnPath(c, self.hidden, self.dtype, self.use_pallas,
                          self.use_pallas_train, name="inter")(xp, seq_axis=1)
        inter = xp[:, olp : olp + old_t, olp : olp + old_q, :]

        # ---- full-band frame self-attention over T -----------------------
        io_bytes = 2 if self.dtype == jnp.bfloat16 else 4
        fused_attn = self.use_pallas and _attn_fast_path_ok(
            c, old_t, old_q, e, h_heads, io_bytes, fused_norms=True)
        q_feat = nn.Dense(h_heads * e, dtype=self.dtype, name="attn_conv_Q")(inter)
        k_feat = nn.Dense(h_heads * e, dtype=self.dtype, name="attn_conv_K")(inter)
        v_feat = nn.Dense(c, dtype=self.dtype, name="attn_conv_V")(inter)
        if fused_attn:
            # Inference fast path: PReLU + per-head E-norm, scores,
            # softmax and the value contraction all run in VMEM — the
            # norm passes over 16x-lane-padded [.., H*E=8] feature maps
            # and the [B,H,T,T] score HBM round-trips both vanish
            # (~640 ms + several ms/forward of the 30-step enhance;
            # ops/attention.py docstring).
            from fdbm_tpu.ops.attention import frame_attention

            norm_params = tuple(
                _AllHeadPReLULayerNorm(h_heads, ed, name=f"attn_norm_{nm}")(
                    None, return_params=True)
                for nm, ed in (("Q", e), ("K", e), ("V", d)))
            out = frame_attention(
                q_feat.reshape(b, old_t, old_q, h_heads * e),
                k_feat.reshape(b, old_t, old_q, h_heads * e),
                v_feat.reshape(b, old_t, old_q, c), h_heads, e,
                norms=norm_params)
        else:
            # lane_stats on the (non-fused) inference fast path: MXU
            # block-diagonal dots instead of minor-axis-2/8 VPU reduces
            # (see _AllHeadPReLULayerNorm).
            ls = self.use_pallas
            q_feat = _AllHeadPReLULayerNorm(h_heads, e, lane_stats=ls,
                                            name="attn_norm_Q")(q_feat)
            k_feat = _AllHeadPReLULayerNorm(h_heads, e, lane_stats=ls,
                                            name="attn_norm_K")(k_feat)
            v_feat = _AllHeadPReLULayerNorm(h_heads, d, lane_stats=ls,
                                            name="attn_norm_V")(v_feat)

        if fused_attn:
            pass
        elif self.use_pallas and _attn_fast_path_ok(c, old_t, old_q, e,
                                                    h_heads, io_bytes):
            # Norm-outside fallback of the fused kernel (kept for shapes
            # where the fused-norm VMEM estimate rejects but the plain
            # kernel fits).
            from fdbm_tpu.ops.attention import frame_attention

            out = frame_attention(
                q_feat.reshape(b, old_t, old_q, h_heads * e),
                k_feat.reshape(b, old_t, old_q, h_heads * e),
                v_feat.reshape(b, old_t, old_q, c), h_heads, e)
        else:
            # The reference flattens heads to [B,H,T,E*Q] before the T x T
            # score matmul (tfgridnet.py:402-411). Those flattens are 4 full
            # 5-D transpose copies per block on TPU (~1.3 GB/forward,
            # profiled round-3); contracting (q, e) directly in one
            # dot_general computes the same sums (score = sum_{q,e} Q.K)
            # with the layout work folded into the matmul's own operand
            # staging.
            q5 = q_feat.reshape(b, old_t, old_q, h_heads, e)
            k5 = k_feat.reshape(b, old_t, old_q, h_heads, e)
            v5 = v_feat.reshape(b, old_t, old_q, h_heads, d)

            scale = 1.0 / np.sqrt(e * old_q)
            attn = jnp.einsum("btqhe,buqhe->bhtu", q5, k5) * scale
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v5.dtype)
            # out[b,t,q,h,d] = sum_u attn[b,h,t,u] v5[b,u,q,h,d]; the final
            # [B,T,Q,H,D] -> [B,T,Q,C] merge (h slow, d fast: reference
            # channel order) is a free contiguous reshape.
            out = jnp.einsum("bhtu,buqhd->btqhd", attn, v5)
            out = out.reshape(b, old_t, old_q, c)

        out = nn.Dense(c, dtype=self.dtype, name="attn_proj")(out)
        out = PReLU(param_shape=(), name="attn_prelu")(out)
        gamma = self.param("attn_ln_gamma", nn.initializers.ones, (c,))
        beta = self.param("attn_ln_beta", nn.initializers.zeros, (c,))
        out = layer_norm_f32(out, gamma, beta, axis=-1)

        return out + inter


class TFGridNet(nn.Module):
    """Generative TF-GridNet: ``(x_t, y, t) -> clean-spec estimate``."""

    n_layers: int = 6
    emb_dim: int = 48
    hidden: int = 200
    n_head: int = 4
    qk_output_channel: int = 2
    n_srcs: int = 1
    time_conditioned: bool = True
    fourier_scale: float = 16.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_train: bool = False
    # Rematerialise each block under autodiff (jax.checkpoint): the 10
    # BiLSTM activation streams dominate training HBM; remat trades ~1/3
    # more forward FLOPs for O(n_layers) less live memory (batch 8 x
    # 256-frame crops fit v5e-1 only with this on). No-op at inference.
    remat: bool = False

    @nn.compact
    def __call__(self, x: Array, y: Array, t: Array = None) -> Array:
        """x, y: complex [B, 1, F, T]; t: [B]. Returns complex [B, 1, F, T]."""
        if self.time_conditioned:
            chans = [jnp.real(x), jnp.imag(x), jnp.real(y), jnp.imag(y)]
        else:
            chans = [jnp.real(y), jnp.imag(y)]
        # [B, 1, F, T] -> [B, T, Q=F, C_in]
        inp = jnp.stack([ch[:, 0].transpose(0, 2, 1) for ch in chans], axis=-1)
        inp = inp.astype(self.dtype)
        c = self.emb_dim

        h = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(inp)
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=jnp.float32, name="gn_in")(h)
        h = h.astype(self.dtype)

        if self.time_conditioned:
            temb = GaussianFourierProjection(
                embedding_size=c, scale=self.fourier_scale, name="time_emb"
            )(jnp.log(t))
            temb = nn.Dense(c * 4, dtype=self.dtype, name="time_fc1")(temb.astype(self.dtype))
            temb = nn.silu(temb)
            temb = nn.Dense(c * 4, dtype=self.dtype, name="time_fc2")(temb)
            temb = nn.silu(temb)

        block_cls = nn.remat(GridNetBlock) if self.remat else GridNetBlock
        for i in range(self.n_layers):
            if self.time_conditioned:
                bias = nn.Dense(c, dtype=self.dtype, name=f"time_block_{i}")(temb)
                h = h + bias[:, None, None, :]
            h = block_cls(
                emb_dim=c, hidden=self.hidden, n_head=self.n_head,
                qk_output_channel=self.qk_output_channel, dtype=self.dtype,
                use_pallas=self.use_pallas,
                use_pallas_train=self.use_pallas_train, name=f"block_{i}",
            )(h)

        out = nn.ConvTranspose(
            self.n_srcs * 2, (3, 3), padding="SAME", dtype=self.dtype, name="deconv_out"
        )(h)
        out = out.astype(jnp.float32)
        # [B, T, Q, n_srcs*2] -> complex [B, n_srcs, F, T]
        b, tt, qq, _ = out.shape
        out = out.reshape(b, tt, qq, self.n_srcs, 2)
        cmplx = jax.lax.complex(out[..., 0], out[..., 1])  # [B, T, Q, S]
        return cmplx.transpose(0, 3, 2, 1)  # [B, S, F, T]


# ---------------------------------------------------------------------------
# Registered variants (names match the reference registry)
# ---------------------------------------------------------------------------


def _make_variant(n_layers, emb_dim, hidden, time_conditioned, **kwargs):
    return TFGridNet(
        n_layers=n_layers, emb_dim=emb_dim, hidden=hidden,
        time_conditioned=time_conditioned,
        dtype=kwargs.get("dtype", jnp.float32),
        use_pallas=kwargs.get("use_pallas", False),
        use_pallas_train=kwargs.get("use_pallas_train", False),
        remat=kwargs.get("remat", False),
    )


@BackboneRegistry.register("tfgridnet_5l32c100")
def tfgridnet_5l32c100(**kwargs):
    return _make_variant(5, 32, 100, True, **kwargs)


@BackboneRegistry.register("tfgridnet_4l32c80")
def tfgridnet_4l32c80(**kwargs):
    return _make_variant(4, 32, 80, True, **kwargs)


@BackboneRegistry.register("tfgridnet_5l32c100_predictive")
def tfgridnet_5l32c100_predictive(**kwargs):
    return _make_variant(5, 32, 100, False, **kwargs)


@BackboneRegistry.register("tfgridnet_4l32c80_predictive")
def tfgridnet_4l32c80_predictive(**kwargs):
    return _make_variant(4, 32, 80, False, **kwargs)
