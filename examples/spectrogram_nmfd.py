"""NMFD demo on a synthetic magnitude spectrogram.

Equivalent of the reference's examples/librosa_example.py (which decomposes
a librosa audio spectrogram with a rank-3, T=400 NMFD): here the
spectrogram is synthesized — three spectral templates convolved with sparse
activations plus noise — so the demo runs without audio dependencies, and
the factorization should recover the three components.

Run:  python examples/spectrogram_nmfd.py
"""

import numpy as np

import pytorch_nmf_tpu as pnt
from pytorch_nmf_tpu.metrics import kl_div
from pytorch_nmf_tpu.nmf import NMFD


def synth_spectrogram(n_freq=256, n_frames=860, rank=3, T=40, seed=0):
    rng = np.random.RandomState(seed)
    # smooth spectral kernels with distinct peaks, evolving over T frames
    W = np.zeros((n_freq, rank, T), "f")
    for r in range(rank):
        center = (r + 1) * n_freq // (rank + 1)
        freq_profile = np.exp(-0.5 * ((np.arange(n_freq) - center) / 8.0) ** 2)
        decay = np.exp(-np.arange(T) / (T / 3))
        W[:, r, :] = freq_profile[:, None] * decay[None, :]
    # sparse activations
    H = (rng.rand(1, rank, n_frames - T + 1) > 0.98).astype("f") * rng.rand(
        1, rank, n_frames - T + 1
    )
    V = NMFD.reconstruct(H, W)
    V = np.asarray(V) + 0.01 * rng.rand(1, n_freq, n_frames).astype("f")
    return V


def main():
    pnt.manual_seed(0)
    V = synth_spectrogram()
    print(f"spectrogram: {V.shape}")

    model = NMFD(V.shape, rank=3, T=40)
    n_iter = model.fit(V, beta=1, tol=1e-6, max_iter=200, verbose=True)
    Vhat = model()

    print(f"converged in {n_iter} iterations")
    print(f"final KL divergence: {float(kl_div(Vhat, V)):.4f}")
    print(f"templates W: {model.W.shape}, activations H: {model.H.shape}")


if __name__ == "__main__":
    main()
