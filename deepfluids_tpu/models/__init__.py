"""Model family: parameterized generator, autoencoder, latent integrator.

Reference parity target: ``model.py`` of byungsook/deep-fluids (SURVEY.md §2
"GeneratorBE" / "Autoencoder" / "Latent integration net" [M][B]).
"""

from deepfluids_tpu.models.generator import GeneratorBE, default_repeat
from deepfluids_tpu.models.autoencoder import Encoder, Autoencoder
from deepfluids_tpu.models.latent import LatentIntegrator, rollout

__all__ = [
    "GeneratorBE",
    "default_repeat",
    "Encoder",
    "Autoencoder",
    "LatentIntegrator",
    "rollout",
]
