"""Architecture-parity audit: parameter counts of every registered preset
must land exactly on the reference sizes (ncsnpp_v2.py:404-453,
tfgridnet.py:487-510) — catching silent width/depth/preset drift.

The only systematic difference is fused LSTM biases: torch nn.LSTM keeps
separate bias_ih/bias_hh (redundant — they are only ever summed), our
BiLSTM stores one; the test adds that known delta back.
"""

import os
import sys

import numpy as np
import pytest

import jax

REFERENCE = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "fdbm")):
    pytest.skip("reference repo not available", allow_module_level=True)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from fdbm_tpu.models import BackboneRegistry  # noqa: E402


def _flax_count(name: str, time_conditioned: bool) -> int:
    model = BackboneRegistry.get_by_name(name)()
    f, t = (257, 32) if name.startswith("ncsnpp") else (17, 8)
    dummy = jax.ShapeDtypeStruct((1, 1, f, t), jax.numpy.complex64)
    tvec = jax.ShapeDtypeStruct((1,), jax.numpy.float32)
    if time_conditioned:
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jax.numpy.zeros((1, 1, f, t), jax.numpy.complex64),
                               jax.numpy.zeros((1, 1, f, t), jax.numpy.complex64),
                               jax.numpy.full((1,), 0.5)))
    else:
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), None,
                               jax.numpy.zeros((1, 1, f, t), jax.numpy.complex64)))
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(params))


def _torch_count(model) -> int:
    return sum(p.numel() for p in model.state_dict().values())


def _lstm_bias_delta(model) -> int:
    """Params saved by fusing bias_ih+bias_hh in every LSTM direction."""
    return sum(v.numel() for k, v in model.state_dict().items()
               if "bias_hh" in k)


@pytest.mark.parametrize("name,hidden", [
    ("tfgridnet_5l32c100", 100),
    ("tfgridnet_4l32c80", 80),
])
def test_tfgridnet_param_counts(name, hidden):
    import fdbm.backbones.tfgridnet as ref_mod

    cls = {"tfgridnet_5l32c100": ref_mod.TFGridNet_5l32c100,
           "tfgridnet_4l32c80": ref_mod.TFGridNet_4l32c80}[name]
    ref = cls()
    expected = _torch_count(ref) - _lstm_bias_delta(ref)
    assert _flax_count(name, True) == expected


def test_tfgridnet_predictive_param_count():
    from fdbm.backbones.tfgridnet_predictive import TFGridNet_5l32c100_predictive

    ref = TFGridNet_5l32c100_predictive()
    expected = _torch_count(ref) - _lstm_bias_delta(ref)
    assert _flax_count("tfgridnet_5l32c100_predictive", False) == expected


@pytest.mark.parametrize("name", ["ncsnpp_v2_5M", "ncsnpp_v2_16M",
                                  "ncsnpp_v2_37M", "ncsnpp_v2"])
def test_ncsnpp_param_counts(name):
    import fdbm.backbones.ncsnpp_v2 as ref_mod

    cls = {"ncsnpp_v2_5M": ref_mod.NCSNpp_v2_5M,
           "ncsnpp_v2_16M": ref_mod.NCSNpp_v2_16M,
           "ncsnpp_v2_37M": ref_mod.NCSNpp_v2_37M,
           "ncsnpp_v2": ref_mod.NCSNpp_v2}[name]
    ref = cls()
    assert _flax_count(name, True) == _torch_count(ref)


def test_ncsnpp_predictive_param_count():
    from fdbm.backbones.ncsnpp_v2_predictive import NCSNpp_v2_5M_predictive

    ref = NCSNpp_v2_5M_predictive()
    assert _flax_count("ncsnpp_v2_5M_predictive", False) == _torch_count(ref)


def test_preset_sizes_are_advertised_magnitudes():
    """The 5M/16M/37M names must mean what they say (within 15%)."""
    for name, millions in [("ncsnpp_v2_5M", 5), ("ncsnpp_v2_16M", 16),
                           ("ncsnpp_v2_37M", 37)]:
        n = _flax_count(name, True)
        assert abs(n / 1e6 - millions) / millions < 0.15, (name, n)
