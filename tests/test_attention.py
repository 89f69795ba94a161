"""Fused frame-attention kernel (ops/attention.py) vs the XLA einsum path.

The kernel computes per-head softmax(QK^T/sqrt(E*Q)) @ V entirely in VMEM
on flat head-minor layouts (reference semantics:
/root/reference/fdbm/backbones/tfgridnet.py:394-418). Runs in Pallas
interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdbm_tpu.ops.attention import frame_attention


def _xla_attention(q, k, v, n_head, e_dim):
    """The GridNetBlock einsum path (models/tfgridnet.py), fp32."""
    b, t, qb, _ = q.shape
    d = v.shape[-1] // n_head
    q5 = q.reshape(b, t, qb, n_head, e_dim)
    k5 = k.reshape(b, t, qb, n_head, e_dim)
    v5 = v.reshape(b, t, qb, n_head, d)
    scale = 1.0 / np.sqrt(e_dim * qb)
    attn = jnp.einsum("btqhe,buqhe->bhtu", q5, k5) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v5.dtype)
    out = jnp.einsum("bhtu,buqhd->btqhd", attn, v5)
    return out.reshape(b, t, qb, n_head * d)


@pytest.mark.parametrize("b,t,qb,h,e,c", [
    (2, 37, 65, 4, 2, 32),    # odd T/Q, V spans 2 lane blocks (65*32 > 2048)
    (1, 13, 7, 4, 2, 32),     # tiny, single partial lane block
    (1, 262, 256, 4, 2, 32),  # production 5l32c100 canvas shape
    (2, 24, 16, 2, 4, 16),    # different head/e split, c=16
])
def test_frame_attention_matches_xla(b, t, qb, h, e, c):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, qb, h * e)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, qb, h * e)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, qb, c)), jnp.float32)

    want = np.asarray(_xla_attention(q, k, v, h, e))
    got = np.asarray(frame_attention(q, k, v, h, e))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_frame_attention_bf16_streams():
    """bf16 io (production serving dtype): kernel keeps fp32 score
    accumulators, so it must stay within bf16 rounding of the fp32 truth."""
    b, t, qb, h, e, c = 2, 50, 40, 4, 2, 32
    rng = np.random.default_rng(1)
    qf = rng.standard_normal((b, t, qb, h * e)).astype(np.float32)
    kf = rng.standard_normal((b, t, qb, h * e)).astype(np.float32)
    vf = rng.standard_normal((b, t, qb, c)).astype(np.float32)

    want = np.asarray(_xla_attention(
        jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf), h, e))
    out = frame_attention(jnp.asarray(qf, jnp.bfloat16),
                          jnp.asarray(kf, jnp.bfloat16),
                          jnp.asarray(vf, jnp.bfloat16), h, e)
    assert out.dtype == jnp.bfloat16
    got = np.asarray(out, np.float32)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 2e-2, f"bf16 frame attention relative error {err}"
    assert np.isfinite(got).all()


@pytest.mark.parametrize("h,e", [(4, 2), (4, 8)])
def test_allhead_norm_lane_stats_matches_reduce(h, e):
    """lane_stats=True (block-diagonal MXU dots) == the E-axis reduce path,
    same params — the two are alternative lowerings of the same math."""
    from fdbm_tpu.models.tfgridnet import _AllHeadPReLULayerNorm

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 9, 7, h * e)), jnp.float32)
    m_red = _AllHeadPReLULayerNorm(h, e)
    m_lane = _AllHeadPReLULayerNorm(h, e, lane_stats=True)
    params = m_red.init(jax.random.PRNGKey(0), x)
    # non-trivial affine/prelu params so the test can see a mixup
    params = jax.tree.map(
        lambda p: p + 0.1 * jnp.arange(p.size, dtype=p.dtype).reshape(p.shape),
        params)
    want = np.asarray(m_red.apply(params, x))
    got = np.asarray(m_lane.apply(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gridnetblock_attention_gate():
    """The dispatch gate accepts the production shapes and rejects
    VMEM-unsafe ones (long T blows the K/V residency + score scratch)."""
    from fdbm_tpu.models.tfgridnet import _attn_fast_path_ok

    assert _attn_fast_path_ok(32, 262, 256, 2, 4)    # 5l32c100, 4 s bucket
    assert _attn_fast_path_ok(32, 102, 80, 2, 4)     # 4l32c80
    assert _attn_fast_path_ok(32, 321, 257, 2, 4)    # 8 s folder bucket
    assert not _attn_fast_path_ok(32, 1000, 256, 2, 4)   # K/V residency
    assert not _attn_fast_path_ok(24, 262, 256, 2, 4)    # 2048 % c != 0


def test_frame_attention_q_tiling_regression():
    """Round-3 folder-sweep failure shape: T=321, Q=257 (8 s bucket,
    bf16 serving). The full-T kernel requested 17.14 MB of scoped VMEM
    (measured by the compiler) — the tile chooser must tile the query
    dim here, stay full-T at the bench shape, and keep numerics exact
    across the tile boundary (incl. the partial last tile, 321 = 2*128
    + 65)."""
    from fdbm_tpu.ops.attention import _pick_q_tile

    assert _pick_q_tile(321, 257 * 8, 4, 2)[0] == 128  # tiles (would OOM)
    assert _pick_q_tile(262, 256 * 8, 4, 2) == (262, 2048)  # bench: full T
    assert _pick_q_tile(1000, 256 * 8, 4, 2) is None  # XLA fallback
    # round-4 sweep calibration: T=577 tq=64 v2048 OOM'd at a measured
    # 16.28 MiB; the ladder must step the V block down instead
    got = _pick_q_tile(577, 257 * 8, 4, 2)
    assert got is not None and got[1] < 2048, got

    b, t, qb, h, e, c = 1, 321, 257, 4, 2, 32
    rng = np.random.default_rng(3)
    qf = rng.standard_normal((b, t, qb, h * e)).astype(np.float32)
    kf = rng.standard_normal((b, t, qb, h * e)).astype(np.float32)
    vf = rng.standard_normal((b, t, qb, c)).astype(np.float32)

    want = np.asarray(_xla_attention(
        jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf), h, e))
    out = frame_attention(jnp.asarray(qf, jnp.bfloat16),
                          jnp.asarray(kf, jnp.bfloat16),
                          jnp.asarray(vf, jnp.bfloat16), h, e)
    got = np.asarray(out, np.float32)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 2e-2, f"tiled bf16 frame attention relative error {err}"
    assert np.isfinite(got).all()


@pytest.mark.parametrize("h,e,qb", [(4, 2, 7), (4, 8, 5)])
def test_flat_group_norm_matches_module(h, e, qb):
    """flat_group_norm on the flat [B,T,Q*H*E] layout == the
    _AllHeadPReLULayerNorm module on the [B,T,Q,H*E] view."""
    from fdbm_tpu.models.tfgridnet import _AllHeadPReLULayerNorm
    from fdbm_tpu.ops.attention import flat_group_norm

    rng = np.random.default_rng(4)
    b, t = 2, 11
    x = jnp.asarray(rng.standard_normal((b, t, qb, h * e)), jnp.float32)
    mod = _AllHeadPReLULayerNorm(h, e)
    params = mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: p + 0.1 * jnp.arange(p.size, dtype=p.dtype).reshape(p.shape),
        params)
    want = np.asarray(mod.apply(params, x)).reshape(b, t, qb * h * e)
    p = params["params"]
    got = np.asarray(flat_group_norm(
        x.reshape(b, t, qb * h * e), p["prelu_alpha"], p["gamma"], p["beta"],
        width=e))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_frame_attention_fused_norms_matches_unfused():
    """frame_attention(norms=...) on RAW projector outputs == PReLU+norm
    modules followed by frame_attention — the production fused path."""
    from fdbm_tpu.models.tfgridnet import _AllHeadPReLULayerNorm

    b, t, qb, h, e, c = 1, 37, 33, 4, 2, 32
    d = c // h
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b, t, qb, h * e)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, qb, h * e)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, qb, c)), jnp.float32)

    mods = [_AllHeadPReLULayerNorm(h, e), _AllHeadPReLULayerNorm(h, e),
            _AllHeadPReLULayerNorm(h, d)]
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    all_params = [m.init(kk, xx) for m, kk, xx in zip(mods, keys, (q, k, v))]
    all_params = [jax.tree.map(
        lambda p: p + 0.07 * jnp.arange(p.size, dtype=p.dtype).reshape(p.shape),
        pp) for pp in all_params]

    qn = mods[0].apply(all_params[0], q).reshape(b, t, qb, h * e)
    kn = mods[1].apply(all_params[1], k).reshape(b, t, qb, h * e)
    vn = mods[2].apply(all_params[2], v).reshape(b, t, qb, c)
    want = np.asarray(frame_attention(qn, kn, vn, h, e))

    norms = tuple((pp["params"]["prelu_alpha"], pp["params"]["gamma"],
                   pp["params"]["beta"]) for pp in all_params)
    got = np.asarray(frame_attention(q, k, v, h, e, norms=norms))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vmem_gate_fp32_headroom():
    """fp32 VMEM-gate regression (r5): the in-training-eval shape that
    OOMed the scoped-VMEM stack (T=321, 257 q-bins, H=8, E=1 -> 2056
    qk lanes, fp32: compiler measured 26.59 MiB vs a 15.1 MiB estimate,
    tq=128/v1024) must now be REJECTED at fp32 — the model falls back to
    the XLA attention path — while the five compiler-anchored bf16
    serving configs keep their exact (tq, v_blk) picks."""
    from fdbm_tpu.ops.attention import _pick_q_tile

    # the r5 soak's OOM shape: fp32 must reject (None -> XLA fallback)
    assert _pick_q_tile(321, 2056, 8, 4, hd=32) is None
    # bf16 production serving configs unchanged (compiler-validated r4):
    assert _pick_q_tile(256, 2056, 8, 2, hd=32) == (256, 2048)
    assert _pick_q_tile(262, 2056, 8, 2, hd=32) == (128, 2048)
    assert _pick_q_tile(321, 2056, 8, 2, hd=32) == (128, 2048)
    # small fp32 shapes (unit tests, short utterances) still fuse
    assert _pick_q_tile(24, 24 * 8, 8, 4, hd=32) is not None
