"""Generate a SYNTHETIC ITU-PESQ golden table (supplementary).

NOTE (round 5): the committed golden table tests/data/pesq_golden.json
is now the 18 REAL ITU P.862.2 scores the reference repo publishes for
its audio_samples demo utterances (real VoiceBank-DEMAND speech), and
tests/test_pesq.py::test_itu_golden_calibration runs against it
in-image.  This script remains for generating an ADDITIONAL synthetic
condition-grid table on any machine with `pip install pesq` (the ITU
P.862.2 binding):

    python tools/gen_pesq_golden.py > tests/data/pesq_golden_synth.json

The conditions are DETERMINISTIC (seeded), so only (name -> MOS) pairs
need committing.
"""

import json
import sys

import numpy as np

SR = 16000


def speechlike(seed: int = 0, seconds: float = 4.0) -> np.ndarray:
    """Deterministic harmonic 'speech-like' carrier (same as the unit
    tests): gated harmonic stack with formant-shaped envelope."""
    rng = np.random.default_rng(seed)
    L = int(seconds * SR)
    t = np.arange(L) / SR
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 2.1 * t))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    sig = np.zeros(L)
    for k in range(1, 25):
        fk = 120 * k
        formant = (np.exp(-((fk - 500) / 350) ** 2)
                   + 0.7 * np.exp(-((fk - 1500) / 500) ** 2)
                   + 0.4 * np.exp(-((fk - 2500) / 600) ** 2))
        sig += formant * np.sin(k * phase)
    gate = ((np.sin(2 * np.pi * 4 * t) > -0.3)
            * (np.sin(2 * np.pi * 0.7 * t) > -0.5))
    del rng
    return (sig * gate * 0.05).astype(np.float32)


def _noise(kind: str, L: int, rng: np.random.Generator) -> np.ndarray:
    w = rng.standard_normal(L).astype(np.float32)
    if kind == "white":
        return w
    if kind == "pink":  # -3 dB/oct via 1/sqrt(f) spectral shaping
        spec = np.fft.rfft(w)
        f = np.maximum(np.fft.rfftfreq(L, 1 / SR), 1.0)
        return np.fft.irfft(spec / np.sqrt(f), n=L).astype(np.float32)
    if kind == "lowpass":  # rumble-like: 4th-order-ish lowpass at 500 Hz
        spec = np.fft.rfft(w)
        f = np.fft.rfftfreq(L, 1 / SR)
        return np.fft.irfft(spec / (1 + (f / 500.0) ** 4), n=L).astype(np.float32)
    if kind == "modulated":  # babble-ish: 4 Hz AM white noise
        t = np.arange(L) / SR
        return (w * (0.5 + 0.5 * np.sin(2 * np.pi * 4 * t))).astype(np.float32)
    raise ValueError(kind)


def golden_conditions():
    """[(name, ref, deg)] — the deterministic calibration grid.

    4 noise types x 6 SNRs (incl. the low-SNR region where the analytic
    Bark/threshold tables are known to deviate) + 2 clipping and 2
    mu-law-ish nonlinear conditions.
    """
    ref = speechlike()
    rng = np.random.default_rng(1234)
    conds = []
    rms2 = float((ref ** 2).mean())
    for kind in ("white", "pink", "lowpass", "modulated"):
        noise = _noise(kind, len(ref), rng)
        noise = noise / np.sqrt((noise ** 2).mean() + 1e-12)
        for snr_db in (30, 20, 10, 5, 0, -5):
            deg = ref + noise * np.sqrt(rms2 / 10 ** (snr_db / 10))
            conds.append((f"{kind}_snr{snr_db:+d}", ref, deg.astype(np.float32)))
    for clip in (0.5, 0.25):
        peak = np.max(np.abs(ref))
        deg = np.clip(ref, -clip * peak, clip * peak) / clip
        conds.append((f"clip_{clip}", ref, deg.astype(np.float32)))
    for mu in (50.0, 255.0):
        peak = np.max(np.abs(ref)) + 1e-9
        x = ref / peak
        deg = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu) * peak
        conds.append((f"mulaw_{int(mu)}", ref, deg.astype(np.float32)))
    return conds


def main():
    try:
        from pesq import pesq as itu_pesq
    except ImportError:
        sys.exit("the ITU `pesq` package is required to GENERATE goldens "
                 "(pip install pesq); this image does not have it — run on "
                 "a machine that does and commit tests/data/pesq_golden.json")
    table = {}
    for name, ref, deg in golden_conditions():
        table[name] = float(itu_pesq(SR, ref, deg, "wb"))
    json.dump({"sr": SR, "mode": "wb", "mos": table}, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
