"""Weight-ported output parity against the reference PyTorch backbones.

The strongest available stand-in for the PESQ +/-0.02 quality gate in a
dataset-less image: port reference weights into the Flax twins, feed
identical inputs, and require matching outputs
(reference: fdbm/backbones/tfgridnet.py:194-229, ncsnpp_v2.py:241-401).

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used here as
a numerical oracle only.
"""

import os
import sys

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

# fdbm.bridge imports fdbm.util.other -> pesq/pystoi, absent from this
# image; stub them (the sampler path under test never calls them).
import types  # noqa: E402

for _mod, _attr in (("pesq", "pesq"), ("pystoi", "stoi")):
    if _mod not in sys.modules:
        stub = types.ModuleType(_mod)
        setattr(stub, _attr, None)
        sys.modules[_mod] = stub

from fdbm_tpu.models import BackboneRegistry  # noqa: E402
from fdbm_tpu.utils.torch_port import (  # noqa: E402
    ncsnpp_from_torch,
    state_dict_to_numpy,
    tfgridnet_from_torch,
)


def _rel_err(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def _complex_randn(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


@pytest.mark.parametrize("variant,f,t", [
    ("tfgridnet_5l32c100", 33, 24),
    ("tfgridnet_4l32c80", 17, 40),
])
def test_tfgridnet_generative_matches_reference(variant, f, t):
    from fdbm.backbones.tfgridnet import (  # noqa: E402
        TFGridNet_4l32c80, TFGridNet_5l32c100)

    torch.manual_seed(0)
    ref_cls = {"tfgridnet_5l32c100": TFGridNet_5l32c100,
               "tfgridnet_4l32c80": TFGridNet_4l32c80}[variant]
    ref = ref_cls().eval()
    n_layers = ref.n_layers

    rng = np.random.default_rng(0)
    x = _complex_randn(rng, (2, 1, f, t)) * 0.3
    y = _complex_randn(rng, (2, 1, f, t)) * 0.3
    tvec = np.array([0.5, 0.9], np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(y),
                      torch.from_numpy(tvec)).numpy()

    flax_model = BackboneRegistry.get_by_name(variant)()
    params = tfgridnet_from_torch(state_dict_to_numpy(ref.state_dict()),
                                  n_layers=n_layers, emb_dim=32)
    out = np.asarray(flax_model.apply(params, jnp.asarray(x), jnp.asarray(y),
                                      jnp.asarray(tvec)))

    assert out.shape == ref_out.shape
    err = _rel_err(out, ref_out)
    assert err < 1e-4, f"relative error {err}"


def test_tfgridnet_predictive_matches_reference():
    from fdbm.backbones.tfgridnet_predictive import TFGridNet_5l32c100_predictive

    torch.manual_seed(1)
    ref = TFGridNet_5l32c100_predictive().eval()

    rng = np.random.default_rng(1)
    y = _complex_randn(rng, (1, 1, 33, 24)) * 0.3
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(y)).numpy()

    flax_model = BackboneRegistry.get_by_name("tfgridnet_5l32c100_predictive")()
    params = tfgridnet_from_torch(state_dict_to_numpy(ref.state_dict()),
                                  n_layers=5, emb_dim=32,
                                  time_conditioned=False)
    out = np.asarray(flax_model.apply(params, None, jnp.asarray(y)))
    err = _rel_err(out, ref_out)
    assert err < 1e-4, f"relative error {err}"


def test_ncsnpp_5m_matches_reference():
    """NCSN++ 5M preset (nf=96, ch_mult=(1,1,1,1), 1 resblock, no attn) with
    a 257-bin input exercising the slice/zero-row path
    (ncsnpp_v2.py:249-250, 398-399)."""
    from fdbm.backbones.ncsnpp_v2 import NCSNpp_v2_5M

    torch.manual_seed(2)
    ref = NCSNpp_v2_5M().eval()

    rng = np.random.default_rng(2)
    f, t = 257, 32  # F must be 256-divisible after slice for the pyramid
    x = _complex_randn(rng, (1, 1, f, t)) * 0.3
    y = _complex_randn(rng, (1, 1, f, t)) * 0.3
    tvec = np.array([0.7], np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(y),
                      torch.from_numpy(tvec)).numpy()

    flax_model = BackboneRegistry.get_by_name("ncsnpp_v2_5M")()
    params = ncsnpp_from_torch(
        state_dict_to_numpy(ref.state_dict()),
        nf=96, ch_mult=(1, 1, 1, 1), num_res_blocks=1, attn_resolutions=(0,))
    out = np.asarray(flax_model.apply(params, jnp.asarray(x), jnp.asarray(y),
                                      jnp.asarray(tvec)))
    assert out.shape == ref_out.shape
    err = _rel_err(out, ref_out)
    assert err < 1e-4, f"relative error {err}"


def test_end_to_end_enhancement_matches_reference():
    """Same weights + same noisy audio through BOTH full pipelines
    (stft -> spec_fwd -> N-step ODE-EI sampler -> spec_back -> istft):
    enhanced waveforms must agree to SI-SDR > 40 dB.

    The SB bridge's reverse-time prior at t=T is exactly y (sigma_T == 0),
    so the ODE-EI sampler is deterministic — no RNG discipline needed.
    Reference pipeline: fdbm/bridge.py:66-87, data_module.py:173-229,
    model.py:391-406.
    """
    from fdbm.backbones.tfgridnet import TFGridNet_5l32c100
    from fdbm.bridge import Bridge as RefBridge

    torch.manual_seed(0)
    ref_dnn = TFGridNet_5l32c100().eval()
    n_steps = 4

    # --- shared input: one normalised noisy utterance -----------------------
    rng = np.random.default_rng(0)
    L = 2 * 16000
    tgrid = np.arange(L) / 16000
    clean = (0.2 * np.sin(2 * np.pi * 440 * tgrid)
             + 0.1 * np.sin(2 * np.pi * 880 * tgrid)).astype(np.float32)
    noisy = clean + 0.05 * rng.standard_normal(L).astype(np.float32)
    noisy = noisy / np.max(np.abs(noisy))

    # --- reference pipeline (torch CPU) -------------------------------------
    n_fft, hop = 512, 256
    win = torch.sqrt(torch.hann_window(n_fft, periodic=True))
    sig = torch.from_numpy(noisy)
    spec = torch.stft(sig, n_fft=n_fft, hop_length=hop, window=win,
                      center=True, return_complex=True)
    spec = spec.abs() ** 0.5 * torch.exp(1j * spec.angle()) * 0.15
    y_t = spec[None, None]  # [1,1,F,T]

    bridge = RefBridge("sb", N=n_steps, sampler_type="ode_ei",
                       noise_schedule="bb")
    with torch.no_grad():
        sample = bridge.sampler(ref_dnn, y_t)[0, 0]
    sample = sample / 0.15
    sample = sample.abs() ** 2 * torch.exp(1j * sample.angle())
    ref_audio = torch.istft(sample, n_fft=n_fft, hop_length=hop, window=win,
                            center=True, length=L).numpy()

    # --- this framework (same weights) ---------------------------------------
    from fdbm_tpu.model import FDBM, FDBMConfig

    cfg = FDBMConfig(mode="generative", backbone="tfgridnet_5l32c100",
                     bridge="sb", noise_schedule="bb", sampler_type="ode_ei",
                     N=n_steps, n_fft=n_fft, hop_length=hop, window="sqrthann")
    fdbm = FDBM(cfg)
    params = tfgridnet_from_torch(state_dict_to_numpy(ref_dnn.state_dict()),
                                  n_layers=5, emb_dim=32)
    tpu_audio = np.asarray(
        fdbm.enhance_batch(params, jnp.asarray(noisy[None]),
                           jax.random.PRNGKey(0))[0])

    assert tpu_audio.shape == ref_audio.shape
    err = ref_audio - tpu_audio
    si_sdr = 10 * np.log10(np.sum(ref_audio ** 2) / (np.sum(err ** 2) + 1e-12))
    assert si_sdr > 40.0, f"end-to-end SI-SDR {si_sdr:.1f} dB"


def test_reference_lightning_checkpoint_import(tmp_path):
    """A reference-format Lightning .ckpt (state_dict with 'dnn.' prefix,
    hyper_parameters, torch_ema shadow) imports into a working model whose
    output matches the EMA weights, and the infer CLI loader accepts it."""
    from fdbm.backbones.tfgridnet import TFGridNet_4l32c80

    torch.manual_seed(4)
    dnn = TFGridNet_4l32c80().eval()

    # torch_ema semantics: shadow over requires_grad params in order;
    # fabricate a shadow distinct from the raw weights
    shadow = [p.detach().clone() * 0.9 + 0.01
              for p in dnn.parameters() if p.requires_grad]
    ckpt = {
        "state_dict": {f"dnn.{k}": v for k, v in dnn.state_dict().items()},
        "hyper_parameters": {
            "backbone": "tfgridnet_4l32c80", "bridge": "sb",
            "noise_schedule": "bb", "sampler_type": "ode_ei", "N": 3,
            "n_fft": 512, "hop_length": 256, "num_frames": 64,
            "sr": 16000, "lr": 1e-4, "data_module_cls": object,  # dropped
        },
        "ema": {"shadow_params": shadow, "num_updates": 1234, "decay": 0.999},
    }
    path = tmp_path / "ref_model.ckpt"
    torch.save(ckpt, str(path))

    from fdbm_tpu.utils.torch_port import load_reference_checkpoint

    hp, params = load_reference_checkpoint(str(path))
    assert hp["backbone"] == "tfgridnet_4l32c80"
    assert "data_module_cls" not in hp  # non-serialisable hparams dropped

    # output equals the torch model with the EMA shadow swapped in
    with torch.no_grad():
        for p, s in zip((p for p in dnn.parameters() if p.requires_grad),
                        shadow):
            p.copy_(s)
    rng = np.random.default_rng(4)
    x = _complex_randn(rng, (1, 1, 17, 16)) * 0.3
    y = _complex_randn(rng, (1, 1, 17, 16)) * 0.3
    tvec = np.array([0.6], np.float32)
    with torch.no_grad():
        ref_out = dnn(torch.from_numpy(x), torch.from_numpy(y),
                      torch.from_numpy(tvec)).numpy()
    flax_model = BackboneRegistry.get_by_name("tfgridnet_4l32c80")()
    out = np.asarray(flax_model.apply(params, jnp.asarray(x), jnp.asarray(y),
                                      jnp.asarray(tvec)))
    assert _rel_err(out, ref_out) < 1e-4

    # the CLI loader path accepts the .ckpt file directly
    sys.path.insert(0, "/root/repo")
    from infer_single import load_model_from_ckpt

    fdbm, state = load_model_from_ckpt(str(path))
    assert fdbm.cfg.backbone == "tfgridnet_4l32c80"
    out2 = np.asarray(fdbm.dnn.apply(state.ema_params, jnp.asarray(x),
                                     jnp.asarray(y), jnp.asarray(tvec)))
    assert _rel_err(out2, ref_out) < 1e-4


def test_ncsnpp_5m_predictive_matches_reference():
    from fdbm.backbones.ncsnpp_v2_predictive import NCSNpp_v2_5M_predictive

    torch.manual_seed(3)
    ref = NCSNpp_v2_5M_predictive().eval()
    rng = np.random.default_rng(3)
    y = _complex_randn(rng, (1, 1, 257, 32)) * 0.3
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(y)).numpy()

    flax_model = BackboneRegistry.get_by_name("ncsnpp_v2_5M_predictive")()
    params = ncsnpp_from_torch(
        state_dict_to_numpy(ref.state_dict()),
        nf=96, ch_mult=(1, 1, 1, 1), num_res_blocks=1, attn_resolutions=(0,),
        time_conditioned=False)
    out = np.asarray(flax_model.apply(params, None, jnp.asarray(y)))
    err = _rel_err(out, ref_out)
    assert err < 1e-4, f"relative error {err}"
