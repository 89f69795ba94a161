"""Reverse weight port (Flax → reference PyTorch) — torch_export.py.

Three gates:
1. round-trip identity: export → re-import reproduces the exact tree;
2. the exported state_dict loads into the REAL reference torch module
   with ``strict=True`` and the two forwards agree (<1e-4 rel err) —
   i.e. a reference user can consume a model trained here;
3. save_reference_checkpoint files re-load via load_reference_checkpoint.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used as a
numerical oracle only.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "fdbm")):
    pytest.skip("reference repo not available", allow_module_level=True)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

for _mod, _attr in (("pesq", "pesq"), ("pystoi", "stoi")):
    if _mod not in sys.modules:
        stub = types.ModuleType(_mod)
        setattr(stub, _attr, None)
        sys.modules[_mod] = stub

from fdbm_tpu.models import BackboneRegistry  # noqa: E402
from fdbm_tpu.utils.torch_export import (  # noqa: E402
    backbone_params_to_torch,
    save_reference_checkpoint,
)
from fdbm_tpu.utils.torch_port import (  # noqa: E402
    backbone_params_from_torch,
    load_reference_checkpoint,
)


def _rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def _complex_randn(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


def _init_flax(backbone: str, f: int, t: int):
    model = BackboneRegistry.get_by_name(backbone)()
    rng = np.random.default_rng(7)
    x = jnp.asarray(_complex_randn(rng, (1, 1, f, t)) * 0.3)
    y = jnp.asarray(_complex_randn(rng, (1, 1, f, t)) * 0.3)
    if backbone.endswith("_predictive"):
        params = model.init(jax.random.PRNGKey(0), None, y)
        args = (None, y)
    else:
        tvec = jnp.asarray(np.array([0.6], np.float32))
        params = model.init(jax.random.PRNGKey(0), x, y, tvec)
        args = (x, y, tvec)
    return model, params, args


@pytest.mark.parametrize("backbone,f,t", [
    ("tfgridnet_4l32c80", 17, 24),
    ("tfgridnet_4l32c80_predictive", 17, 24),
    ("ncsnpp_v2_5M", 257, 32),
])
def test_export_import_round_trip(backbone, f, t):
    """export → import reproduces the exact parameter tree."""
    _, params, _ = _init_flax(backbone, f, t)
    sd = backbone_params_to_torch(backbone, params)
    back = backbone_params_from_torch(backbone, sd)

    flat0, _ = jax.tree_util.tree_flatten_with_path(params)
    flat1, _ = jax.tree_util.tree_flatten_with_path(back)
    assert len(flat0) == len(flat1)
    for (k0, v0), (k1, v1) in zip(flat0, flat1):
        assert k0 == k1
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                                   rtol=0, atol=0,
                                   err_msg=jax.tree_util.keystr(k0))


@pytest.mark.parametrize("backbone,f,t", [
    ("tfgridnet_4l32c80", 17, 24),
    ("ncsnpp_v2_5M", 257, 32),
])
def test_exported_weights_drive_reference_module(backbone, f, t):
    """strict-load the export into the reference torch module and match
    forwards — proves migration back to the reference works."""
    if backbone == "tfgridnet_4l32c80":
        from fdbm.backbones.tfgridnet import TFGridNet_4l32c80 as RefCls
    else:
        from fdbm.backbones.ncsnpp_v2 import NCSNpp_v2_5M as RefCls

    model, params, args = _init_flax(backbone, f, t)
    sd = backbone_params_to_torch(backbone, params)

    ref = RefCls().eval()
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected

    out = np.asarray(model.apply(params, *args))
    with torch.no_grad():
        targs = [torch.from_numpy(np.asarray(a)) for a in args
                 if a is not None]
        ref_out = ref(*targs).numpy()
    err = _rel_err(out, ref_out)
    assert err < 1e-4, f"{backbone} exported-weight forward rel err {err}"


def test_checkpoint_file_round_trip(tmp_path):
    """save_reference_checkpoint output re-loads through the forward
    importer (and therefore also matches the reference's dnn. layout)."""
    backbone = "tfgridnet_4l32c80"
    _, params, _ = _init_flax(backbone, 17, 24)
    path = str(tmp_path / "export.ckpt")
    save_reference_checkpoint(path, backbone, params,
                              hyper_parameters={"mode": "generative"})
    hp, back = load_reference_checkpoint(path, use_ema=False)
    assert hp["backbone"] == backbone and hp["mode"] == "generative"
    flat0 = jax.tree_util.tree_leaves(params)
    flat1 = jax.tree_util.tree_leaves(back)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(flat0, flat1))
