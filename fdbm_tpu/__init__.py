"""FDBM-TPU: a TPU-native (JAX/Flax/Pallas) speech-enhancement framework.

Re-implements the capabilities of the FDBM reference ("Rethinking Flow and
Diffusion Bridge Models for Speech Enhancement", AAAI 2026) with a TPU-first
design: complex-spectrogram flow-matching / Schroedinger-bridge / predictive
models, NCSN++ and TF-GridNet backbones, exponential-integrator samplers as
`lax.scan` loops, and data-parallel training over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

__all__ = [
    "dsp",
    "paths",
    "sampling",
    "losses",
    "model",
    "data",
    "train",
    "infer",
    "config",
    "checkpoint",
]
