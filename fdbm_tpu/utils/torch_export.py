"""Reverse weight port: Flax parameter trees → reference PyTorch state_dicts.

The inverse of :mod:`fdbm_tpu.utils.torch_port`: models trained in this
framework export to checkpoints the reference codebase loads directly
(``torch.nn.Module.load_state_dict(strict=True)`` on the reference
backbones, or a Lightning-style ``.ckpt`` dict with the reference's
``dnn.``-prefixed keys and ``hyper_parameters``, fdbm/model.py:69).
Together the two modules make the weight port bidirectional, so a
reference user can migrate in either direction without retraining.

Every converter here inverts the corresponding converter in torch_port
(layout transposes, LSTM gate unfold reordering, ConvTranspose spatial
flips); round-trip identity and torch-module output parity are tested in
tests/test_torch_export.py. The one non-bijective point: torch stores the
LSTM bias as a redundant pair (bias_ih + bias_hh, summed on use,
reference tfgridnet.py:341-392); export puts the fused bias in
``bias_ih_l0*`` and zeros in ``bias_hh_l0*`` — functionally identical.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from fdbm_tpu.utils.torch_port import (
    _NCSNPP_PRESETS,
    _TFGRIDNET_PRESETS,
    _unfold_perm,
)


def _np(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, np.float32))


def _inv_conv2d(p: Mapping, name: str) -> Dict[str, np.ndarray]:
    # torch_port._conv2d: weight [O,I,kh,kw] -> kernel [kh,kw,I,O]
    return {f"{name}.weight": _np(p["kernel"]).transpose(3, 2, 0, 1),
            f"{name}.bias": _np(p["bias"])}


def _inv_conv_transpose2d(p: Mapping, name: str) -> Dict[str, np.ndarray]:
    # torch_port._conv_transpose2d: weight [I,O,kh,kw] spatially flipped
    # then transposed to [kh,kw,I,O]
    k = _np(p["kernel"]).transpose(2, 3, 0, 1)
    return {f"{name}.weight": np.ascontiguousarray(k[:, :, ::-1, ::-1]),
            f"{name}.bias": _np(p["bias"])}


def _inv_dense_from_1x1(p: Mapping, name: str) -> Dict[str, np.ndarray]:
    return {f"{name}.weight": _np(p["kernel"]).T[:, :, None, None],
            f"{name}.bias": _np(p["bias"])}


def _inv_dense(p: Mapping, name: str) -> Dict[str, np.ndarray]:
    return {f"{name}.weight": np.ascontiguousarray(_np(p["kernel"]).T),
            f"{name}.bias": _np(p["bias"])}


def _inv_bilstm(p: Mapping, name: str, c: int,
                permute_input: bool = True) -> Dict[str, np.ndarray]:
    """BiLSTM {w_ih [2,D,4H], w_hh [2,H,4H], bias [2,4H]} → torch nn.LSTM."""
    inv = np.argsort(_unfold_perm(c)) if permute_input else None
    out: Dict[str, np.ndarray] = {}
    for z, sfx in ((0, ""), (1, "_reverse")):
        w_ih = _np(p["w_ih"][z])
        if inv is not None:
            w_ih = w_ih[inv, :]
        out[f"{name}.weight_ih_l0{sfx}"] = np.ascontiguousarray(w_ih.T)
        out[f"{name}.weight_hh_l0{sfx}"] = np.ascontiguousarray(
            _np(p["w_hh"][z]).T)
        out[f"{name}.bias_ih_l0{sfx}"] = _np(p["bias"][z])
        out[f"{name}.bias_hh_l0{sfx}"] = np.zeros_like(_np(p["bias"][z]))
    return out


def _inv_fold_dense(deconv: Mapping, bias, name: str, c: int,
                    ks: int = 4) -> Dict[str, np.ndarray]:
    # torch_port._fold_dense: w [2H,C,k] -> kernel [2H, k*C] tap-major
    kernel = _np(deconv["kernel"])
    w = kernel.reshape(kernel.shape[0], ks, c).transpose(0, 2, 1)
    return {f"{name}.weight": np.ascontiguousarray(w),
            f"{name}.bias": _np(bias)}


def _inv_allhead_norm(p: Mapping, name: str) -> Dict[str, np.ndarray]:
    # gamma/beta [H,E] -> [1,H,E,1,1]; prelu_alpha [H,1] -> act.weight [H]
    return {f"{name}.gamma": _np(p["gamma"])[None, :, :, None, None],
            f"{name}.beta": _np(p["beta"])[None, :, :, None, None],
            f"{name}.act.weight": _np(p["prelu_alpha"]).reshape(-1)}


def _unwrap(params) -> Mapping:
    return params["params"] if "params" in params else params


def tfgridnet_to_torch(params, n_layers: int, emb_dim: int,
                       time_conditioned: bool = True) -> Dict[str, np.ndarray]:
    """models.tfgridnet Flax params → reference TFGridNet(V3) state_dict
    (module names: fdbm/backbones/tfgridnet.py:126-192)."""
    p = _unwrap(params)
    c = emb_dim
    sd: Dict[str, np.ndarray] = {}
    sd.update(_inv_conv2d(p["conv_in"], "conv.0"))
    sd["conv.1.weight"] = _np(p["gn_in"]["scale"])
    sd["conv.1.bias"] = _np(p["gn_in"]["bias"])
    if time_conditioned:
        sd["get_time_emb.W"] = _np(p["time_emb"]["W"])
        sd.update(_inv_dense(p["time_fc1"], "time_emb_fc.0"))
        sd.update(_inv_dense(p["time_fc2"], "time_emb_fc.2"))
        for i in range(n_layers):
            sd.update(_inv_dense(p[f"time_block_{i}"],
                                 f"time_emb_blocks.{i}"))
    for i in range(n_layers):
        blk = p[f"block_{i}"]
        for path, tname in (("intra", "intra"), ("inter", "inter")):
            sub = blk[path]
            sd[f"blocks.{i}.{tname}_norm.weight"] = _np(sub["ln_gamma"])
            sd[f"blocks.{i}.{tname}_norm.bias"] = _np(sub["ln_beta"])
            sd.update(_inv_bilstm(sub["bilstm"], f"blocks.{i}.{tname}_rnn", c))
            sd.update(_inv_fold_dense(sub["deconv"], sub["deconv_bias"],
                                      f"blocks.{i}.{tname}_linear", c))
        for qkv in ("Q", "K", "V"):
            sd.update(_inv_dense_from_1x1(blk[f"attn_conv_{qkv}"],
                                          f"blocks.{i}.attn_conv_{qkv}"))
            sd.update(_inv_allhead_norm(blk[f"attn_norm_{qkv}"],
                                        f"blocks.{i}.attn_norm_{qkv}"))
        sd.update(_inv_dense_from_1x1(blk["attn_proj"],
                                      f"blocks.{i}.attn_concat_proj.0"))
        sd[f"blocks.{i}.attn_concat_proj.1.weight"] = \
            _np(blk["attn_prelu"]["alpha"]).reshape(1)
        # LayerNormalization(emb_dim, dim=-3, total_dim=4): [1, C, 1, 1]
        sd[f"blocks.{i}.attn_concat_proj.2.gamma"] = \
            _np(blk["attn_ln_gamma"])[None, :, None, None]
        sd[f"blocks.{i}.attn_concat_proj.2.beta"] = \
            _np(blk["attn_ln_beta"])[None, :, None, None]
    sd.update(_inv_conv_transpose2d(p["deconv_out"], "deconv"))
    return sd


def _inv_groupnorm(p: Mapping, name: str) -> Dict[str, np.ndarray]:
    return {f"{name}.weight": _np(p["scale"]), f"{name}.bias": _np(p["bias"])}


def _inv_nin(p: Mapping, name: str) -> Dict[str, np.ndarray]:
    return {f"{name}.W": _np(p["kernel"]), f"{name}.b": _np(p["bias"])}


def _inv_resblock(p: Mapping, pfx: str) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    sd.update(_inv_groupnorm(p["gn0"], f"{pfx}.GroupNorm_0"))
    sd.update(_inv_conv2d(p["conv0"], f"{pfx}.Conv_0"))
    sd.update(_inv_groupnorm(p["gn1"], f"{pfx}.GroupNorm_1"))
    sd.update(_inv_conv2d(p["conv1"], f"{pfx}.Conv_1"))
    if "temb_proj" in p:
        sd.update(_inv_dense(p["temb_proj"], f"{pfx}.Dense_0"))
    if "shortcut" in p:
        sd.update(_inv_dense_from_1x1(p["shortcut"], f"{pfx}.Conv_2"))
    return sd


def _inv_attnblock(p: Mapping, pfx: str) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    sd.update(_inv_groupnorm(p["norm"], f"{pfx}.GroupNorm_0"))
    for i, key in enumerate(("q", "k", "v", "proj")):
        sd.update(_inv_nin(p[key], f"{pfx}.NIN_{i}"))
    return sd


def ncsnpp_to_torch(params, nf: int = 128, ch_mult=(1, 1, 2, 2, 2, 2, 2),
                    num_res_blocks: int = 2, attn_resolutions=(16,),
                    image_size: int = 256,
                    time_conditioned: bool = True) -> Dict[str, np.ndarray]:
    """models.ncsnpp Flax params → reference NCSNpp_v2 state_dict, walking
    the same ``all_modules`` construction order as the forward port
    (ncsnpp_v2.py:95-239)."""
    p = _unwrap(params)
    num_resolutions = len(ch_mult)
    all_res = [image_size // (2 ** i) for i in range(num_resolutions)]
    idx = [0]

    def nxt() -> str:
        pfx = f"all_modules.{idx[0]}"
        idx[0] += 1
        return pfx

    sd: Dict[str, np.ndarray] = {}
    if time_conditioned:
        sd[f"{nxt()}.W"] = _np(p["time_emb"]["W"])
        sd.update(_inv_dense(p["time_fc0"], nxt()))
        sd.update(_inv_dense(p["time_fc1"], nxt()))
    sd.update(_inv_conv2d(p["conv_in"], nxt()))

    for i_level in range(num_resolutions):
        for i_block in range(num_res_blocks):
            sd.update(_inv_resblock(p[f"down_{i_level}_{i_block}"], nxt()))
            if all_res[i_level] in attn_resolutions:
                sd.update(_inv_attnblock(
                    p[f"down_attn_{i_level}_{i_block}"], nxt()))
        if i_level != num_resolutions - 1:
            sd.update(_inv_resblock(p[f"down_{i_level}_ds"], nxt()))
            sd.update(_inv_dense_from_1x1(p[f"combine_{i_level}"],
                                          f"{nxt()}.Conv_0"))

    sd.update(_inv_resblock(p["mid_0"], nxt()))
    sd.update(_inv_attnblock(p["mid_attn"], nxt()))
    sd.update(_inv_resblock(p["mid_1"], nxt()))

    for i_level in reversed(range(num_resolutions)):
        for i_block in range(num_res_blocks + 1):
            sd.update(_inv_resblock(p[f"up_{i_level}_{i_block}"], nxt()))
        if all_res[i_level] in attn_resolutions:
            sd.update(_inv_attnblock(p[f"up_attn_{i_level}"], nxt()))
        sd.update(_inv_groupnorm(p[f"pyr_gn_{i_level}"], nxt()))
        sd.update(_inv_conv2d(p[f"pyr_conv_{i_level}"], nxt()))
        if i_level != 0:
            sd.update(_inv_resblock(p[f"up_{i_level}_us"], nxt()))

    sd.update(_inv_dense_from_1x1(p["output_layer"], "output_layer"))
    return sd


def backbone_params_to_torch(backbone: str, params) -> Dict[str, np.ndarray]:
    """Export a backbone's Flax params to a reference state_dict by
    registry name (inverse of torch_port.backbone_params_from_torch)."""
    if backbone in _TFGRIDNET_PRESETS:
        return tfgridnet_to_torch(params, **_TFGRIDNET_PRESETS[backbone])
    if backbone in _NCSNPP_PRESETS:
        return ncsnpp_to_torch(params, **_NCSNPP_PRESETS[backbone])
    raise ValueError(f"No torch-export preset for backbone {backbone!r}")


def save_reference_checkpoint(path: str, backbone: str, params,
                              hyper_parameters: Dict = None) -> None:
    """Write a reference-compatible ``.ckpt``: ``state_dict`` with the
    reference's ``dnn.``-prefixed keys plus ``hyper_parameters`` (what
    BridgeModel.save_hyperparameters stores, fdbm/model.py:69). The
    reference's checkpoint loaders — and this framework's own
    load_reference_checkpoint — both accept it."""
    import torch

    sd = backbone_params_to_torch(backbone, params)
    hp = dict(hyper_parameters or {})
    hp.setdefault("backbone", backbone)
    torch.save({
        "state_dict": {f"dnn.{k}": torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "hyper_parameters": hp,
    }, path)
