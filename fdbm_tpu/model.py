"""Model layer: generative bridge, predictive, and fine-tuning objectives.

Functional re-design of the reference Lightning modules
(fdbm/model.py:25-477). Instead of a stateful trainer object, this module
builds **pure jittable step functions** plus a TrainState pytree:

* ``FDBM.train_step(state, batch, key)`` — one optimiser step: on-device
  STFT + compression, t ~ U[t_eps, T] path perturbation (model.py:267-275),
  backbone forward, configured loss (model.py:162-256), global-norm clip
  3.0 + Adam, EMA update with torch_ema's num_updates correction
  (model.py:129-132).
* ``FDBM.valid_step`` — loss under EMA parameters (the reference swaps EMA
  weights in for eval, model.py:146-160).
* ``FDBM.enhance_spec`` / ``FDBM.enhance_audio`` — N-step sampler
  enhancement (model.py:391-406) with device-neutral placement (the
  reference hardcodes .cuda()).
* mode='finetuning' — the "enhanced bridge": unrolls the ODE-EI sampler
  with stop_gradient on all but the final model call (model.py:450-474;
  the reference calls `sampling_param_ode`, a latent AttributeError — we
  implement the intended `sampling_param_ode_ei` semantics).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from fdbm_tpu import dsp, losses
from fdbm_tpu.models import BackboneRegistry
from fdbm_tpu.sampling import Bridge, complex_normal_like

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# LR schedules (reference fdbm/util/schedulers.py:227-256 + torch ExponentialLR)
# ---------------------------------------------------------------------------


def make_lr_schedule(scheduler_config: Optional[Dict[str, Any]], lr: float):
    cfg = scheduler_config or {"scheduler": "fixed"}
    kind = cfg.get("scheduler", "fixed")
    if kind == "fixed":
        return lambda step: jnp.asarray(lr, jnp.float32)
    sub = cfg.get("config", {})
    if kind == "warmup":
        warmup_steps = sub["warmup_steps"]
        decay_until = sub["decay_until_step"]
        max_lr = sub["max_lr"]
        min_lr = sub["min_lr"]

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            warm = max_lr * step / warmup_steps
            ratio = jnp.clip((step - warmup_steps) / (decay_until - warmup_steps), 0.0, 1.0)
            cos = min_lr + 0.5 * (1.0 + jnp.cos(jnp.pi * ratio)) * (max_lr - min_lr)
            return jnp.where(step < warmup_steps, warm,
                             jnp.where(step > decay_until, min_lr, cos))

        return schedule
    if kind == "exp":
        gamma = sub["gamma"]

        def schedule(step):
            return lr * jnp.power(gamma, jnp.asarray(step, jnp.float32))

        return schedule
    raise ValueError(f"Unknown scheduler {kind}")


# ---------------------------------------------------------------------------
# Train state
# ---------------------------------------------------------------------------


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    ema_num_updates: jnp.ndarray


@dataclasses.dataclass
class FDBMConfig:
    """Config surface; key names match the reference YAML (config.yaml)."""

    mode: str = "generative"  # generative | predictive | finetuning
    backbone: str = "tfgridnet_5l32c100"
    bridge: str = "sb"
    noise_schedule: str = "bb"
    sampler_type: str = "sde_ei"
    N: int = 5
    T: float = 1.0
    sampling_eps: float = 1e-4
    t_eps: float = 0.03
    lr: float = 1e-4
    ema_decay: float = 0.999
    loss_type: str = "data_prediction_hybrid"
    l1_weight: float = 0.001
    pesq_weight: float = 0.0
    sr: int = 16000
    scheduler_config: Optional[Dict[str, Any]] = None
    # SB schedule params
    k: float = 2.6
    c: float = 0.4
    beta_0: float = 0.01
    beta_1: float = 20.0
    rho: float = 1.0
    sigma_max: float = 1.0
    sigma_min: float = 0.01
    # STFT / compression
    n_fft: int = 512
    hop_length: int = 256
    num_frames: int = 256
    window: str = "sqrthann"
    spec_factor: float = 0.15
    spec_abs_exponent: float = 0.5
    transform_type: str = "exponent"
    normalize: str = "noisy"
    # numerics
    param_dtype: str = "float32"
    compute_dtype: str = "float32"
    # dtype for the sampling/enhance path; "" inherits compute_dtype.
    # bfloat16 roughly doubles MXU throughput on TPU at a small numeric
    # cost (norm statistics and the final complex output stay fp32).
    inference_dtype: str = ""
    # micro-batch accumulation (reference --accumulate_grad_batches,
    # train.py:82): optimiser applies every k-th step via optax.MultiSteps.
    accumulate_grad_batches: int = 1
    # Rematerialise each backbone block in the training backward pass
    # (jax.checkpoint): trades ~1/3 more forward FLOPs for O(depth) less
    # activation memory — batch 8 x 256-frame TF-GridNet crops fit v5e-1
    # HBM only with this on (without it the 10 BiLSTM activation streams
    # OOM). No effect on inference.
    remat: bool = False

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "FDBMConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


class FDBM:
    """Builds pure train/eval/enhance functions from a config."""

    def __init__(self, cfg: FDBMConfig):
        self.cfg = cfg
        if cfg.mode == "predictive" and not cfg.backbone.endswith("_predictive"):
            raise ValueError(
                f"mode='predictive' requires a *_predictive backbone "
                f"(got {cfg.backbone!r}), matching the reference config pairing "
                f"(config_predictive.yaml)."
            )
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        on_tpu = jax.default_backend() == "tpu"
        # Training backbone: the differentiable Pallas LSTM (custom VJP)
        # replaces the XLA scan on TPU (fast compile + VMEM-resident
        # recurrence for both passes).  FDBM_TPU_TRAIN_KERNEL=0/1
        # overrides the default (used by tools/train_traj_equiv.py to run
        # the fused-vs-XLA loss-trajectory equivalence on one backend).
        tk_env = os.environ.get("FDBM_TPU_TRAIN_KERNEL")
        use_train_kernel = on_tpu if tk_env is None else tk_env == "1"
        self.dnn = BackboneRegistry.get_by_name(cfg.backbone)(
            dtype=dtype, use_pallas_train=use_train_kernel, remat=cfg.remat)
        # Sampling-path twin with the Pallas LSTM recurrence kernel (same
        # parameters; forward-only). Enabled on TPU where it cuts compile
        # time by orders of magnitude and keeps the recurrence in VMEM.
        use_pallas = on_tpu
        inf_dtype = (jnp.bfloat16 if cfg.inference_dtype == "bfloat16"
                     else dtype) if cfg.inference_dtype != "float32" else jnp.float32
        self.dnn_sample = BackboneRegistry.get_by_name(cfg.backbone)(
            dtype=inf_dtype, use_pallas=use_pallas)
        self.bridge = Bridge.create(
            cfg.bridge, N=cfg.N, T=cfg.T, sampler_type=cfg.sampler_type,
            sampling_eps=cfg.sampling_eps, noise_schedule=cfg.noise_schedule,
            k=cfg.k, c=cfg.c, beta_0=cfg.beta_0, beta_1=cfg.beta_1, rho=cfg.rho,
            sigma_max=cfg.sigma_max, sigma_min=cfg.sigma_min,
        )
        self.window = jnp.asarray(dsp.get_window(cfg.window, cfg.n_fft))
        self.loss_cfg = losses.LossConfig(
            n_fft=cfg.n_fft, hop_length=cfg.hop_length,
            window=tuple(np.asarray(self.window).tolist()),
            num_frames=cfg.num_frames, spec_factor=cfg.spec_factor,
            spec_abs_exponent=cfg.spec_abs_exponent,
            transform_type=cfg.transform_type, loss_type=cfg.loss_type,
            l1_weight=cfg.l1_weight, pesq_weight=cfg.pesq_weight,
            sample_rate=cfg.sr,
        )
        self.lr_schedule = make_lr_schedule(cfg.scheduler_config, cfg.lr)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(3.0),
            optax.adam(self.lr_schedule),
        )
        if cfg.accumulate_grad_batches > 1:
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=cfg.accumulate_grad_batches)

    # -- spec helpers -------------------------------------------------------

    def audio_to_spec(self, audio: Array) -> Array:
        """[B, L] real -> [B, 1, F, T] compressed complex spec (on device)."""
        spec = dsp.stft(audio, self.cfg.n_fft, self.cfg.hop_length, self.window)
        return dsp.spec_fwd(spec, self.cfg.spec_factor, self.cfg.spec_abs_exponent,
                            self.cfg.transform_type)[:, None]

    def spec_to_audio(self, spec: Array, length: Optional[int] = None) -> Array:
        back = dsp.spec_back(spec, self.cfg.spec_factor, self.cfg.spec_abs_exponent,
                             self.cfg.transform_type)
        return dsp.istft(back, self.cfg.n_fft, self.cfg.hop_length, self.window,
                         length=length)

    def model_fn(self, params, fast: bool = False):
        """(x_t, y, t) -> estimate, with the mode-appropriate signature.

        fast=True uses the Pallas-kernel twin (inference only, no grads).
        """
        dnn = self.dnn_sample if fast else self.dnn
        if self.cfg.mode == "predictive":
            return lambda x_t, y, t: dnn.apply(params, None, y)
        return lambda x_t, y, t: dnn.apply(params, x_t, y, t)

    # -- init ---------------------------------------------------------------

    def init_params(self, key: jax.Array, batch_size: int = 1):
        f = self.cfg.n_fft // 2 + 1
        # Parameter shapes don't depend on the frame count; init on a short
        # crop (multiple of 64 for NCSN++'s pyramid) so the init program
        # compiles quickly. Use the sampling twin — identical parameter
        # structure, lighter forward.
        t_frames = min(self.cfg.num_frames, 64)

        # Jit the whole init: one compiled program instead of op-by-op
        # dispatch, and complex dummies materialise on device only.
        @jax.jit
        def _init(key):
            dummy = jnp.zeros((batch_size, 1, f, t_frames), jnp.complex64)
            t = jnp.full((batch_size,), 0.5, jnp.float32)
            if self.cfg.mode == "predictive":
                return self.dnn_sample.init(key, None, dummy)
            return self.dnn_sample.init(key, dummy, dummy, t)

        return _init(key)

    def init_state(self, key: jax.Array, batch_size: int = 1) -> TrainState:
        params = self.init_params(key, batch_size)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            ema_num_updates=jnp.zeros((), jnp.int32),
        )

    # -- objective ----------------------------------------------------------

    def _sample_prior(self, key: jax.Array, x: Array, y: Array):
        """t ~ U[t_eps, T]; x_t = a_t x + b_t y + sigma_t z (model.py:267-275)."""
        kt, kz = jax.random.split(key)
        b = x.shape[0]
        t = jax.random.uniform(kt, (b,), jnp.float32) * (self.cfg.T - self.cfg.t_eps) \
            + self.cfg.t_eps
        mean, std = self.bridge.probability_path(x, y, t)
        z = complex_normal_like(kz, x)
        x_t = mean + std[:, None, None, None] * z
        return t, mean, z, x_t

    def _finetune_unrolled(self, params, y: Array, key: jax.Array) -> Array:
        """Unrolled ODE-EI sampler; grads only through the final model call
        (reference model.py:450-474)."""
        bridge = self.bridge
        xt = bridge.prior_sampling(key, y)
        times = bridge.time_grid()
        batch = y.shape[0]
        # Steps 1..N-1 carry no gradient (stop_gradient below), so they can
        # use the fast forward-only path; only the final call needs autodiff.
        model = self.model_fn(params)
        model_nograd = self.model_fn(params, fast=True)
        n = bridge.N
        for i in range(n):
            t_prev, t_curr = times[i], times[i + 1]
            fn = model if i == n - 1 else model_nograd
            est = fn(xt, y, jnp.full((batch,), t_prev, jnp.float32))
            if i < n - 1:
                est = jax.lax.stop_gradient(est)
                xt = jax.lax.stop_gradient(xt)
            w_xt, w_s, w_y = bridge.path.sampling_param_ode_ei(t_curr, t_prev)
            xt = (w_xt.astype(jnp.complex64) * xt
                  + w_s.astype(jnp.complex64) * est
                  + w_y.astype(jnp.complex64) * y)
        return xt

    def loss_fn(self, params, batch, key: jax.Array) -> Array:
        """batch: (x_audio, y_audio) or (x_audio, y_audio, weights[B]).

        The optional 0/1 weights mask items out of the batch mean (used by
        validation to ignore wrap-padded remainder duplicates)."""
        x_audio, y_audio = batch[0], batch[1]
        weights = batch[2] if len(batch) > 2 else None
        x = self.audio_to_spec(x_audio)
        y = self.audio_to_spec(y_audio)
        mode = self.cfg.mode
        if mode == "generative":
            t, mean, z, x_t = self._sample_prior(key, x, y)
            x_hat = self.dnn.apply(params, x_t, y, t)
        elif mode == "predictive":
            x_hat = self.dnn.apply(params, None, y)
        elif mode == "finetuning":
            x_hat = self._finetune_unrolled(params, y, key)
        else:
            raise ValueError(f"Unknown mode {mode}")
        return losses.compute_loss(self.loss_cfg, x_hat, x, weights)

    # -- steps --------------------------------------------------------------

    def train_step(self, state: TrainState, batch, key: jax.Array):
        loss, grads = jax.value_and_grad(self.loss_fn)(state.params, batch, key)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA with torch_ema's use_num_updates correction:
        # decay_t = min(decay, (1+n)/(10+n)).
        # Under gradient accumulation the blend runs only on micro-steps
        # where MultiSteps actually applied an optimizer update (the
        # reference updates EMA in optimizer_step, fdbm/model.py:129-132);
        # after .update(), mini_step == 0 iff an application just happened.
        if self.cfg.accumulate_grad_batches > 1:
            applied = opt_state.mini_step == 0
        else:
            applied = jnp.array(True)
        n = state.ema_num_updates + applied.astype(jnp.int32)
        decay = jnp.minimum(self.cfg.ema_decay, (1.0 + n) / (10.0 + n))
        ema_params = jax.tree_util.tree_map(
            lambda e, p: jnp.where(applied, e - (1.0 - decay) * (e - p), e),
            state.ema_params, params
        )
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_params, ema_num_updates=n,
        )
        metrics = {
            "train_loss": loss,
            "learning_rate": self.lr_schedule(state.step),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    def valid_step(self, state: TrainState, batch, key: jax.Array) -> Array:
        """Validation loss under EMA weights (reference eval-time EMA swap)."""
        return self.loss_fn(state.ema_params, batch, key)

    # -- enhancement --------------------------------------------------------

    def enhance_spec(self, params, y_spec: Array, key: jax.Array,
                     sampler_type: Optional[str] = None,
                     N: Optional[int] = None, **kwargs) -> Array:
        """Run the sampler on a compressed spec [B,1,F,T] -> clean spec."""
        bridge = self.bridge
        if sampler_type is not None or N is not None:
            bridge = dataclasses.replace(
                bridge,
                sampler_type=sampler_type or bridge.sampler_type,
                N=N or bridge.N,
            )
        if self.cfg.mode == "predictive":
            return self.dnn_sample.apply(params, None, y_spec)
        return bridge.sample(self.model_fn(params, fast=True), y_spec, key, **kwargs)

    def enhance_batch(self, params, y_audio: Array, key: jax.Array,
                      sampler_type: Optional[str] = None,
                      N: Optional[int] = None,
                      pad_mode: str = "zero_pad", **kwargs) -> Array:
        """Fully-jittable audio->audio enhancement of a normalised batch.

        [B, L] float32 in, [B, L] float32 out.  All complex intermediates
        (STFT, sampler state) stay inside the computation — required on
        backends where complex64 cannot cross the host/jit boundary, and
        the efficient layout regardless (one fused device program per
        padded-length bucket).

        pad_mode: frame padding for NCSN++ ("zero_pad" in validation eval,
        "reflection" in the inference CLIs; reference infer_single.py:64-69).
        """
        length = y_audio.shape[-1]
        y_spec = self.audio_to_spec(y_audio)
        if self.cfg.backbone.startswith("ncsnpp"):
            # reflection padding operates on |real| views in the reference
            # (torch ReflectionPad2d on complex is unsupported there too);
            # pad the complex spec componentwise.
            if pad_mode == "reflection":
                re = dsp.pad_spec(jnp.real(y_spec), "reflection")
                im = dsp.pad_spec(jnp.imag(y_spec), "reflection")
                y_spec = jax.lax.complex(re, im)
            else:
                y_spec = dsp.pad_spec(y_spec, pad_mode)
        sample = self.enhance_spec(params, y_spec, key, sampler_type, N, **kwargs)
        return self.spec_to_audio(sample[:, 0], length=length)

    def enhance_audio(self, params, y: np.ndarray, key: jax.Array,
                      sampler_type: Optional[str] = None,
                      N: Optional[int] = None, **kwargs) -> np.ndarray:
        """Enhance one utterance [L] (host convenience; see infer.py for the
        batched/bucketed production driver)."""
        if self.cfg.normalize == "noisy":
            norm = float(np.max(np.abs(y)))
        elif self.cfg.normalize == "std":
            norm = float(np.std(y))
        else:
            norm = 1.0
        norm = norm if norm != 0 else 1.0
        y_n = jnp.asarray(y[None, :] / norm, jnp.float32)
        x_hat = self.enhance_batch(params, y_n, key, sampler_type, N, **kwargs)
        return np.asarray(x_hat[0]) * norm
