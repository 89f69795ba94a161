"""Differentiable fused grid-RNN (ops/gridrnn_train.py) vs an XLA oracle.

Forward: crop-row exactness against the same numpy-semantics oracle as
tests/test_gridrnn.py. Backward: the custom VJP must equal the autodiff of
the ideal unfold -> BiLSTM -> deconv -> fold pipeline for EVERY input
(x, w_ih, w_hh, bias, w_deconv) under a crop-supported cotangent — the only
cotangents the model graph ever produces (GridNetBlock's olp crop, see the
module docstring). Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdbm_tpu.ops.gridrnn_train import grid_fold_train_pair

KS = 4


def _jax_oracle(x, w_ih, w_hh, bias, wd):
    """Differentiable unfold -> BiLSTM -> deconv -> fold (torch semantics)."""
    s_len, b, c = x.shape
    L = s_len - (KS - 1)
    win = jnp.concatenate([x[t : t + L] for t in range(KS)], axis=-1)

    def lstm(w_i, w_h, bi, reverse):
        hid = w_h.shape[0]

        def cell(carry, xt):
            h, cst = carry
            g = xt @ w_i + h @ w_h + bi
            i = jax.nn.sigmoid(g[:, :hid])
            f = jax.nn.sigmoid(g[:, hid : 2 * hid])
            gg = jnp.tanh(g[:, 2 * hid : 3 * hid])
            o = jax.nn.sigmoid(g[:, 3 * hid :])
            cst = f * cst + i * gg
            h = o * jnp.tanh(cst)
            return (h, cst), h

        init = (jnp.zeros((b, hid), x.dtype), jnp.zeros((b, hid), x.dtype))
        _, out = jax.lax.scan(cell, init, win, reverse=reverse)
        return out

    fwd = lstm(w_ih[0], w_hh[0], bias[0], False)
    bwd = lstm(w_ih[1], w_hh[1], bias[1], True)
    z = jnp.concatenate([fwd, bwd], axis=-1) @ wd  # [L, B, 4C]
    return sum(
        jnp.pad(z[:, :, t * c : (t + 1) * c],
                ((t, KS - 1 - t), (0, 0), (0, 0)))
        for t in range(KS))


def _rand_args(s_len, b, c, hidden, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((s_len, b, c)), jnp.float32) * 0.5
    w_ih = jnp.asarray(rng.standard_normal((2, KS * c, 4 * hidden)),
                       jnp.float32) * 0.2
    w_hh = jnp.asarray(rng.standard_normal((2, hidden, 4 * hidden)),
                       jnp.float32) * 0.2
    bias = jnp.asarray(rng.standard_normal((2, 4 * hidden)), jnp.float32) * 0.2
    wd = jnp.asarray(rng.standard_normal((2 * hidden, KS * c)),
                     jnp.float32) * 0.2
    return x, w_ih, w_hh, bias, wd


SHAPES = [
    (35, 12, 16, 24),  # L=32: exact fwd (16) and bwd (8) chunk multiples
    (29, 5, 8, 10),    # L=26: partial chunks in both passes
    (14, 40, 8, 6),    # L=11: single fwd chunk; 5 backward b-tiles (tile 8)
    (15, 32, 16, 24),  # the GridNetBlock intra-path shape (r5 diagnosis)
    (16, 30, 16, 24),  # the GridNetBlock inter-path shape (r5 diagnosis)
]


@pytest.mark.parametrize("s_len,b,c,hidden", SHAPES)
def test_train_forward_matches_oracle_on_crop(s_len, b, c, hidden):
    args = _rand_args(s_len, b, c, hidden)
    outf, outb = grid_fold_train_pair(*args)
    got = np.asarray(outf + outb)
    want = np.asarray(_jax_oracle(*args))
    L = s_len - (KS - 1)
    np.testing.assert_allclose(got[3:L], want[3:L], rtol=2e-4, atol=2e-4)
    assert np.isfinite(got).all()


@pytest.mark.parametrize("s_len,b,c,hidden", SHAPES)
def test_train_grads_match_oracle(s_len, b, c, hidden):
    """VJP vs autodiff oracle for a crop-supported cotangent, all 5 inputs."""
    args = _rand_args(s_len, b, c, hidden)
    L = s_len - (KS - 1)
    rng = np.random.default_rng(99)
    cot = jnp.asarray(rng.standard_normal((L - 3, b, c)), jnp.float32)

    def loss_fused(*a):
        outf, outb = grid_fold_train_pair(*a)
        return jnp.sum((outf + outb)[3:L] * cot)

    def loss_oracle(*a):
        return jnp.sum(_jax_oracle(*a)[3:L] * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["x", "w_ih", "w_hh", "bias", "w_deconv"]
    for nm, gf, go in zip(names, g_fused, g_oracle):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(go), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch for {nm}")


def test_train_forward_value_matches_inference_kernel():
    """The stashing forward must produce the inference kernel's values on
    the crop (same fused pipeline, fp32 io)."""
    from fdbm_tpu.ops.gridrnn import grid_bilstm_fold

    args = _rand_args(35, 12, 16, 24, seed=7)
    outf, outb = grid_fold_train_pair(*args)
    got = np.asarray(outf + outb)
    want = np.asarray(grid_bilstm_fold(*args))
    L = 35 - (KS - 1)
    np.testing.assert_allclose(got[3:L], want[3:L], rtol=1e-5, atol=1e-5)


def _assert_grads_close_normrel(g_ref, g_fused, gate: float):
    """Per-leaf norm-relative gradient comparison.

    WHY norm-relative and not elementwise (round-5 diagnosis): the kernel
    VJP is exact to ~3e-7 norm-relative at the block's own shapes
    (test_train_grads_match_oracle, SHAPES[3:5]), so any block-level gap
    comes from fp32 forward-value noise amplified by the downstream grad
    conditioning (attention softmax, LN).  A measured control
    (test_block_grad_conditioning_control) shows a 1e-6 RELATIVE forward
    perturbation moves the XLA reference path's OWN gradients by
    norm-rel ~2e-4 / elementwise up to 1.3e-1 absolute — 10x MORE than
    the fused-vs-ref gap (2.3e-5 / 2.8e-3).  An elementwise atol gate is
    therefore unachievable for ANY fp32 reimplementation, including the
    reference vs itself under rounding; norm-relative with a gate below
    the intrinsic conditioning is the meaningful equivalence statement.
    Tight elementwise gates stay in the kernel-level oracle tests above.

    The per-leaf denominator is floored at 1e-4 of the GLOBAL gradient
    norm: leaves whose exact gradient is analytically ~zero (e.g. the K
    PReLU-norm beta — a uniform K shift moves every score row uniformly,
    which softmax is invariant to) hold pure fp32 cancellation residue in
    BOTH paths, so their relative error is meaningless noise-vs-noise;
    the floor instead asserts "negligible leaves stay negligible".
    """
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    gnorm = np.sqrt(sum(
        float(np.sum(np.abs(np.asarray(l)) ** 2))
        for _, l in flat_ref))
    for (path, a), bq in zip(flat_ref, flat_fused):
        a = np.asarray(a)
        bq = np.asarray(bq)
        denom = max(np.linalg.norm(a), 1e-4 * gnorm)
        rel = np.linalg.norm(a - bq) / denom
        assert rel < gate, (
            f"grad norm-rel {rel:.3e} >= {gate} at "
            f"{jax.tree_util.keystr(path)}")


def _block_case():
    b, t, q, c, hidden = 2, 10, 9, 16, 24
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((b, t, q, c)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, t, q, c)), jnp.float32)
    return x, cot, c, hidden


def test_gridnetblock_train_flag_equivalence():
    """GridNetBlock(use_pallas_train=True): same params, same output and
    same grads (params + input) as the XLA scan train path. The fused
    kernel's pad-contaminated rows live outside the block's olp crop and
    carry zero cotangent, so block-level loss/grads must agree (up to
    the block's own fp32 conditioning — see _assert_grads_close_normrel)."""
    from fdbm_tpu.models.tfgridnet import GridNetBlock

    x, cot, c, hidden = _block_case()
    blk_ref = GridNetBlock(emb_dim=c, hidden=hidden)
    blk_fused = GridNetBlock(emb_dim=c, hidden=hidden, use_pallas_train=True)
    params = blk_ref.init(jax.random.PRNGKey(0), x)

    def loss(p, xx, blk):
        return jnp.sum(blk.apply(p, xx) * cot)

    l_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(params, x, blk_ref)
    l_fused, g_fused = jax.value_and_grad(loss, argnums=(0, 1))(
        params, x, blk_fused)

    np.testing.assert_allclose(float(l_fused), float(l_ref),
                               rtol=1e-5, atol=1e-5)
    # measured 2.3e-5 max leaf (r5); intrinsic conditioning floor ~2e-4
    _assert_grads_close_normrel(g_ref, g_fused, gate=1e-4)


def test_block_grad_conditioning_control():
    """The committed control behind the norm-relative gates: perturbing the
    XLA reference path's INPUT by 1e-6 relative noise (the scale of fp32
    rounding differences between any two valid op orderings) moves its own
    gradients by MORE than the fused-vs-ref gap ever measures.  This pins
    the elementwise mismatches seen at block level on intrinsic fp32
    conditioning of the block (softmax attention + LN grad paths), not on
    the custom VJP — which the kernel-level oracle tests hold to ~3e-7."""
    from fdbm_tpu.models.tfgridnet import GridNetBlock

    x, cot, c, hidden = _block_case()
    blk = GridNetBlock(emb_dim=c, hidden=hidden)
    params = blk.init(jax.random.PRNGKey(0), x)

    def grads(xx):
        def loss(p, xi):
            return jnp.sum(blk.apply(p, xi) * cot)
        return jax.grad(loss, argnums=(0, 1))(params, xx)

    rng = np.random.default_rng(17)
    pert = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    g0 = grads(x)
    g1 = grads(x * (1 + 1e-6 * pert))

    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    worst_rel = max(
        np.linalg.norm(np.asarray(a) - np.asarray(b))
        / max(np.linalg.norm(np.asarray(a)), 1e-6)
        for a, b in zip(flat0, flat1))
    worst_abs = max(
        np.abs(np.asarray(a) - np.asarray(b)).max()
        for a, b in zip(flat0, flat1))
    # Measured r5 on CPU: worst_rel ~4.2e-4, worst_abs ~1.3e-1.  The
    # assertions bound it from BELOW: the reference path against itself
    # already exceeds both the old elementwise atol gate (2e-4) and the
    # fused-vs-ref norm-rel gap (2.3e-5) under 1e-6 forward noise.
    assert worst_abs > 2e-4, worst_abs
    assert worst_rel > 2e-5, worst_rel


def test_tfgridnet_train_flag_equivalence():
    """Full TFGridNet forward + param grads: fused train path == scan path."""
    from fdbm_tpu.models.tfgridnet import TFGridNet

    b, f, t = 1, 17, 12
    rng = np.random.default_rng(11)
    xr = rng.standard_normal((2, b, 1, f, t)).astype(np.float32)
    yr = rng.standard_normal((2, b, 1, f, t)).astype(np.float32)
    x = jnp.asarray(xr[0] + 1j * xr[1])
    y = jnp.asarray(yr[0] + 1j * yr[1])
    tt = jnp.asarray([0.7], jnp.float32)

    kwargs = dict(n_layers=2, emb_dim=16, hidden=20)
    net_ref = TFGridNet(**kwargs)
    net_fused = TFGridNet(use_pallas_train=True, **kwargs)
    params = net_ref.init(jax.random.PRNGKey(1), x, y, tt)

    def loss(p, net):
        out = net.apply(p, x, y, tt)
        return jnp.mean(jnp.abs(out) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss)(params, net_ref)
    l_fused, g_fused = jax.value_and_grad(loss)(params, net_fused)
    np.testing.assert_allclose(float(l_fused), float(l_ref),
                               rtol=1e-5, atol=1e-6)
    # norm-relative: see _assert_grads_close_normrel for the measured
    # conditioning argument (elementwise gates are unachievable in fp32).
    # Gate 1e-3: the 2-layer net's OWN grads move 3.3e-2 worst-leaf under
    # a 1e-6 forward perturbation (r5 control); fused-vs-ref measures
    # 2.3e-4 worst — 100x inside the intrinsic conditioning.
    _assert_grads_close_normrel(g_ref, g_fused, gate=1e-3)
