"""Torch-checkpoint → Flax parameter conversion.

Ports reference PyTorch weights (fdbm/backbones/tfgridnet.py,
fdbm/backbones/ncsnpp_v2.py) into this framework's Flax parameter trees so
numerical parity with the reference can be proven (and reference-trained
checkpoints reused). The converters take a ``state_dict``-like mapping of
numpy arrays — call :func:`state_dict_to_numpy` on a torch state_dict
first so this module never imports torch.

Layout conventions handled here:
* torch Conv2d ``[O, I, kh, kw]`` → flax ``[kh, kw, I, O]``;
* torch ConvTranspose2d ``[I, O, kh, kw]`` → flax ConvTranspose kernels
  with *flipped* spatial taps (verified numerically: a stride-1 transposed
  conv is a regular conv with the flipped kernel);
* torch 1×1 Conv2d → flax Dense ``[I, O]``;
* torch bidirectional LSTM (gate order i,f,g,o; separate ih/hh biases) →
  the fused ``[2, D, 4H] / [2, H, 4H] / [2, 4H]`` BiLSTM parameters;
* torch ``F.unfold`` channel ordering (channel-major, tap-minor) → this
  framework's (tap-major, channel-minor) window layout, absorbed by
  permuting the LSTM input-weight rows;
* torch ConvTranspose1d ``[I, O, k]`` → the fold Dense ``[I, k*O]``
  (tap-major columns) + per-position bias.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

_OLP_KS = 4  # emb_ks used by both frameworks


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict into plain numpy arrays."""
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}


def _conv2d(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    w = sd[f"{name}.weight"]  # [O, I, kh, kw]
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": sd[f"{name}.bias"]}


def _conv_transpose2d(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    w = sd[f"{name}.weight"]  # [I, O, kh, kw]
    return {"kernel": np.ascontiguousarray(
        w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)),
        "bias": sd[f"{name}.bias"]}


def _dense_from_1x1(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    w = sd[f"{name}.weight"]  # [O, I, 1, 1]
    return {"kernel": np.ascontiguousarray(w[:, :, 0, 0].T),
            "bias": sd[f"{name}.bias"]}


def _dense(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
            "bias": sd[f"{name}.bias"]}


def _unfold_perm(c: int, ks: int = _OLP_KS) -> np.ndarray:
    """Permutation mapping this framework's window index (tap-major:
    m = j*c + ch) to torch unfold's (channel-major: n = ch*ks + j)."""
    m = np.arange(ks * c)
    j, ch = m // c, m % c
    return ch * ks + j


def _bilstm(sd: Mapping[str, np.ndarray], name: str, c: int,
            permute_input: bool = True) -> Dict[str, np.ndarray]:
    """torch nn.LSTM(bidirectional) → BiLSTM params {w_ih, w_hh, bias}."""
    perm = _unfold_perm(c) if permute_input else None

    def one(dirn: str):
        sfx = "" if dirn == "fwd" else "_reverse"
        w_ih = sd[f"{name}.weight_ih_l0{sfx}"].T  # [D, 4H]
        if perm is not None:
            w_ih = w_ih[perm, :]
        w_hh = sd[f"{name}.weight_hh_l0{sfx}"].T  # [H, 4H]
        bias = sd[f"{name}.bias_ih_l0{sfx}"] + sd[f"{name}.bias_hh_l0{sfx}"]
        return w_ih, w_hh, bias

    wf, hf, bf = one("fwd")
    wr, hr, br = one("rev")
    return {"w_ih": np.stack([wf, wr]).astype(np.float32),
            "w_hh": np.stack([hf, hr]).astype(np.float32),
            "bias": np.stack([bf, br]).astype(np.float32)}


def _fold_dense(sd: Mapping[str, np.ndarray], name: str, c: int):
    """torch ConvTranspose1d(2H→C, k) → Dense [2H, k*C] (tap-major) + bias."""
    w = sd[f"{name}.weight"]  # [2H, C, k]
    k = w.shape[-1]
    # column (j, ch) of the Dense = w[:, ch, j]
    kernel = w.transpose(0, 2, 1).reshape(w.shape[0], k * c)
    return {"kernel": np.ascontiguousarray(kernel)}, sd[f"{name}.bias"]


def _allhead_norm(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    gamma = sd[f"{name}.gamma"][0, :, :, 0, 0]  # [H, E]
    beta = sd[f"{name}.beta"][0, :, :, 0, 0]
    alpha = sd[f"{name}.act.weight"].reshape(-1, 1)  # [H, 1]
    return {"gamma": gamma, "beta": beta, "prelu_alpha": alpha}


def tfgridnet_from_torch(sd: Mapping[str, np.ndarray], n_layers: int,
                         emb_dim: int,
                         time_conditioned: bool = True) -> Dict:
    """Reference TFGridNet(V3) state_dict → flax params for models.tfgridnet.

    Reference module names: fdbm/backbones/tfgridnet.py:126-192 (generative)
    and tfgridnet_predictive.py (no time embedding).
    """
    c = emb_dim
    p: Dict = {}
    p["conv_in"] = _conv2d(sd, "conv.0")
    p["gn_in"] = {"scale": sd["conv.1.weight"], "bias": sd["conv.1.bias"]}
    if time_conditioned:
        p["time_emb"] = {"W": sd["get_time_emb.W"]}
        p["time_fc1"] = _dense(sd, "time_emb_fc.0")
        p["time_fc2"] = _dense(sd, "time_emb_fc.2")
        for i in range(n_layers):
            p[f"time_block_{i}"] = _dense(sd, f"time_emb_blocks.{i}")
    for i in range(n_layers):
        blk: Dict = {}
        for path, tname in (("intra", "intra"), ("inter", "inter")):
            fold, fold_bias = _fold_dense(sd, f"blocks.{i}.{tname}_linear", c)
            blk[path] = {
                "ln_gamma": sd[f"blocks.{i}.{tname}_norm.weight"],
                "ln_beta": sd[f"blocks.{i}.{tname}_norm.bias"],
                "bilstm": _bilstm(sd, f"blocks.{i}.{tname}_rnn", c),
                "deconv": fold,
                "deconv_bias": fold_bias,
            }
        for qkv in ("Q", "K", "V"):
            blk[f"attn_conv_{qkv}"] = _dense_from_1x1(sd, f"blocks.{i}.attn_conv_{qkv}")
            blk[f"attn_norm_{qkv}"] = _allhead_norm(sd, f"blocks.{i}.attn_norm_{qkv}")
        blk["attn_proj"] = _dense_from_1x1(sd, f"blocks.{i}.attn_concat_proj.0")
        blk["attn_prelu"] = {
            "alpha": sd[f"blocks.{i}.attn_concat_proj.1.weight"].reshape(())}
        blk["attn_ln_gamma"] = sd[f"blocks.{i}.attn_concat_proj.2.gamma"].reshape(-1)
        blk["attn_ln_beta"] = sd[f"blocks.{i}.attn_concat_proj.2.beta"].reshape(-1)
        p[f"block_{i}"] = blk
    p["deconv_out"] = _conv_transpose2d(sd, "deconv")

    return _to_jax(p)


def _to_jax(tree):
    import jax
    import jax.numpy as jnp

    return {"params": jax.tree_util.tree_map(jnp.asarray, tree)}


# ---------------------------------------------------------------------------
# NCSN++ v2
# ---------------------------------------------------------------------------


def _groupnorm(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _nin(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    """NIN stores W as [in, out] already (layers.py:546-555)."""
    return {"kernel": sd[f"{name}.W"], "bias": sd[f"{name}.b"]}


def _resblock(sd: Mapping[str, np.ndarray], pfx: str) -> Dict[str, np.ndarray]:
    """ResnetBlockBigGANpp (layerspp.py:212-274) → flax ResnetBlockBigGAN."""
    blk = {
        "gn0": _groupnorm(sd, f"{pfx}.GroupNorm_0"),
        "conv0": _conv2d(sd, f"{pfx}.Conv_0"),
        "gn1": _groupnorm(sd, f"{pfx}.GroupNorm_1"),
        "conv1": _conv2d(sd, f"{pfx}.Conv_1"),
    }
    if f"{pfx}.Dense_0.weight" in sd:
        blk["temb_proj"] = _dense(sd, f"{pfx}.Dense_0")
    if f"{pfx}.Conv_2.weight" in sd:
        blk["shortcut"] = _dense_from_1x1(sd, f"{pfx}.Conv_2")
    return blk


def _attnblock(sd: Mapping[str, np.ndarray], pfx: str) -> Dict[str, np.ndarray]:
    """AttnBlockpp (layerspp.py:62-91) → flax AttnBlock."""
    return {
        "norm": _groupnorm(sd, f"{pfx}.GroupNorm_0"),
        "q": _nin(sd, f"{pfx}.NIN_0"),
        "k": _nin(sd, f"{pfx}.NIN_1"),
        "v": _nin(sd, f"{pfx}.NIN_2"),
        "proj": _nin(sd, f"{pfx}.NIN_3"),
    }


def ncsnpp_from_torch(sd: Mapping[str, np.ndarray],
                      nf: int = 128,
                      ch_mult=(1, 1, 2, 2, 2, 2, 2),
                      num_res_blocks: int = 2,
                      attn_resolutions=(16,),
                      image_size: int = 256,
                      time_conditioned: bool = True) -> Dict:
    """Reference NCSNpp_v2 state_dict → flax params for models.ncsnpp.

    Walks the reference's ``all_modules`` flat list in construction order
    (ncsnpp_v2.py:95-239) and assigns each index to the corresponding
    named flax submodule. Config must match how the torch model was built.
    """
    num_resolutions = len(ch_mult)
    all_res = [image_size // (2 ** i) for i in range(num_resolutions)]
    idx = [0]

    def nxt() -> str:
        pfx = f"all_modules.{idx[0]}"
        idx[0] += 1
        return pfx

    p: Dict = {}
    if time_conditioned:
        p["time_emb"] = {"W": sd[f"{nxt()}.W"]}
        p["time_fc0"] = _dense(sd, nxt())
        p["time_fc1"] = _dense(sd, nxt())
    p["conv_in"] = _conv2d(sd, nxt())

    for i_level in range(num_resolutions):
        for i_block in range(num_res_blocks):
            p[f"down_{i_level}_{i_block}"] = _resblock(sd, nxt())
            if all_res[i_level] in attn_resolutions:
                p[f"down_attn_{i_level}_{i_block}"] = _attnblock(sd, nxt())
        if i_level != num_resolutions - 1:
            p[f"down_{i_level}_ds"] = _resblock(sd, nxt())
            p[f"combine_{i_level}"] = _dense_from_1x1(sd, f"{nxt()}.Conv_0")

    p["mid_0"] = _resblock(sd, nxt())
    p["mid_attn"] = _attnblock(sd, nxt())
    p["mid_1"] = _resblock(sd, nxt())

    for i_level in reversed(range(num_resolutions)):
        for i_block in range(num_res_blocks + 1):
            p[f"up_{i_level}_{i_block}"] = _resblock(sd, nxt())
        if all_res[i_level] in attn_resolutions:
            p[f"up_attn_{i_level}"] = _attnblock(sd, nxt())
        p[f"pyr_gn_{i_level}"] = _groupnorm(sd, nxt())
        p[f"pyr_conv_{i_level}"] = _conv2d(sd, nxt())
        if i_level != 0:
            p[f"up_{i_level}_us"] = _resblock(sd, nxt())

    n_modules = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("all_modules."))
    if idx[0] != n_modules:
        raise ValueError(
            f"module walk consumed {idx[0]} of {n_modules} all_modules — "
            f"config mismatch with the checkpoint")

    p["output_layer"] = _dense_from_1x1(sd, "output_layer")
    return _to_jax(p)


# ---------------------------------------------------------------------------
# Reference Lightning checkpoint import (migration path)
# ---------------------------------------------------------------------------

# backbone registry name -> (converter kwargs); mirrors the reference
# presets (ncsnpp_v2.py:404-453, tfgridnet.py:487-510)
_TFGRIDNET_PRESETS = {
    "tfgridnet_5l32c100": dict(n_layers=5, emb_dim=32),
    "tfgridnet_4l32c80": dict(n_layers=4, emb_dim=32),
    "tfgridnet_5l32c100_predictive": dict(n_layers=5, emb_dim=32,
                                          time_conditioned=False),
    "tfgridnet_4l32c80_predictive": dict(n_layers=4, emb_dim=32,
                                         time_conditioned=False),
}
_NCSNPP_PRESETS = {
    "ncsnpp_v2": dict(nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2),
                      num_res_blocks=2, attn_resolutions=(16,)),
    "ncsnpp_v2_5M": dict(nf=96, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
                         attn_resolutions=(0,)),
    "ncsnpp_v2_16M": dict(nf=64, ch_mult=(1, 1, 2, 2, 2, 2, 2),
                          num_res_blocks=2, attn_resolutions=(0,)),
    "ncsnpp_v2_37M": dict(nf=96, ch_mult=(1, 1, 2, 2, 2, 2, 2),
                          num_res_blocks=2, attn_resolutions=(16,)),
    "ncsnpp_v2_predictive": dict(nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2),
                                 num_res_blocks=2, attn_resolutions=(16,),
                                 time_conditioned=False),
    "ncsnpp_v2_5M_predictive": dict(nf=96, ch_mult=(1, 1, 1, 1),
                                    num_res_blocks=1, attn_resolutions=(0,),
                                    time_conditioned=False),
}


def backbone_params_from_torch(backbone: str,
                               sd: Mapping[str, np.ndarray]) -> Dict:
    """Convert a reference backbone state_dict by registry name."""
    if backbone in _TFGRIDNET_PRESETS:
        return tfgridnet_from_torch(sd, **_TFGRIDNET_PRESETS[backbone])
    if backbone in _NCSNPP_PRESETS:
        return ncsnpp_from_torch(sd, **_NCSNPP_PRESETS[backbone])
    raise ValueError(f"No torch-import preset for backbone {backbone!r}")


def _apply_ema_shadow(sd: Dict[str, np.ndarray], ema_state) -> Dict[str, np.ndarray]:
    """Overwrite trainable params with torch_ema shadow values.

    torch_ema tracks ``[p for p in model.parameters() if p.requires_grad]``
    in registration order; the only requires_grad=False parameters in the
    reference backbones are the GaussianFourierProjection W vectors
    (layerspp.py:36, shared.py). state_dict order equals registration
    order for parameters (neither backbone registers buffers).
    """
    shadow = [t.detach().cpu().numpy() for t in ema_state["shadow_params"]]
    trainable = [k for k in sd if not _is_gfp_key(k)]
    if len(trainable) != len(shadow):
        raise ValueError(
            f"EMA shadow has {len(shadow)} tensors but checkpoint has "
            f"{len(trainable)} trainable params — cannot align")
    out = dict(sd)
    for k, v in zip(trainable, shadow):
        if out[k].shape != v.shape:
            raise ValueError(f"EMA shape mismatch at {k}: "
                             f"{out[k].shape} vs {v.shape}")
        out[k] = v
    return out


def _is_gfp_key(k: str) -> bool:
    """GaussianFourierProjection W (requires_grad=False in the reference)."""
    return k in ("get_time_emb.W", "all_modules.0.W")


def load_reference_checkpoint(path: str, use_ema: bool = True):
    """Load a reference PyTorch-Lightning ``.ckpt`` file.

    Returns ``(config_dict, flax_params)``: the checkpoint's saved
    hyper_parameters (keys compatible with FDBMConfig.from_dict — the
    reference's save_hyperparameters() stores the same YAML surface,
    fdbm/model.py:69) and this framework's parameter tree, with the
    torch_ema shadow weights applied when present (the reference swaps
    EMA weights in for inference, fdbm/model.py:146-160).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hp = {k: v for k, v in dict(ckpt.get("hyper_parameters", {})).items()
          if isinstance(v, (int, float, str, bool, dict, list, tuple))
          or v is None}
    state = ckpt.get("state_dict", ckpt)
    dnn_sd = {k[len("dnn."):]: v for k, v in state.items()
              if k.startswith("dnn.")}
    if not dnn_sd:
        dnn_sd = state  # bare backbone state_dict (load_state_dict_for_dnn)
    sd = {k: v.detach().cpu().numpy() for k, v in dnn_sd.items()}
    if use_ema and isinstance(ckpt.get("ema"), dict) \
            and "shadow_params" in ckpt["ema"]:
        sd = _apply_ema_shadow(sd, ckpt["ema"])
    backbone = hp.get("backbone")
    if backbone is None:
        raise ValueError(f"{path} has no 'backbone' hyperparameter; pass a "
                         f"Lightning checkpoint saved by the reference")
    params = backbone_params_from_torch(backbone, sd)
    return hp, params
