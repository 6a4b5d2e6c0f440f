"""Source-filter decomposition with frozen templates + BetaMu.

Equivalent of the reference's examples/speech_decomposition.ipynb pattern:
a composed model ``V ≈ (excitation NMF output) * (filter NMF output)`` where
the excitation templates are fixed (e.g. harmonic combs) and only the
activations and filter bank are learned, trained with the closure-based
multiplicative updater.

Run:  python examples/source_filter_model.py
"""

import numpy as np

import pytorch_nmf_tpu as pnt
from pytorch_nmf_tpu.metrics import beta_div
from pytorch_nmf_tpu.module import Module, Parameter
from pytorch_nmf_tpu.nmf import NMF
from pytorch_nmf_tpu.trainer import BetaMu


class SourceFilter(Module):
    """V ≈ (H_e @ W_eᵀ) ⊙ (H_f @ W_fᵀ): excitation times filter."""

    def __init__(self, n_freq, n_frames, W_excitation, rank_filter):
        super().__init__()
        self.excitation = NMF(
            W=W_excitation,
            H=(n_frames, W_excitation.shape[1]),
            trainable_W=False,  # frozen harmonic templates
        )
        self.filter = NMF((n_frames, n_freq), rank_filter)

    def forward(self, _=None):
        return self.excitation() * self.filter()


def harmonic_templates(n_freq, n_pitches=24):
    W = np.zeros((n_freq, n_pitches), "f")
    for p in range(n_pitches):
        f0 = 4 + 2 * p
        for h in range(1, n_freq // max(f0, 1)):
            if h * f0 < n_freq:
                W[h * f0, p] = 1.0 / h
    return W + 1e-4


def main():
    pnt.manual_seed(0)
    n_freq, n_frames = 128, 200
    rng = np.random.RandomState(0)
    target = rng.rand(n_frames, n_freq).astype("f")

    model = SourceFilter(n_freq, n_frames, harmonic_templates(n_freq), 8)
    trainer = BetaMu(model.parameters(), beta=1)

    def closure():
        trainer.zero_grad()
        return target, model()

    for step in range(30):
        trainer.step(closure)
        if step % 10 == 9:
            loss = float(beta_div(model(), target, 1))
            print(f"step {step + 1}: KL = {loss:.4f}")

    frozen = model.excitation.W.data
    assert not model.excitation.W.requires_grad
    print("frozen excitation templates untouched:", frozen.shape)


if __name__ == "__main__":
    main()
