"""TPU-native RNN wavefunctions trained by Variational Monte Carlo.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MatteoMartinelli97/RNNWavefunctions (Hibat-Allah et al., Phys. Rev. Research
2, 023358 (2020)).  See SURVEY.md for the reference blueprint.
"""

__version__ = "0.1.0"

from .models.prnn1d import PRNN1D
from .hamiltonians.tfim1d import TFIM1D
from .vmc.trainer import TrainConfig, TrainState, VMCTrainer
from .parallel.mesh import make_mesh

__all__ = [
    "PRNN1D",
    "TFIM1D",
    "TrainConfig",
    "TrainState",
    "VMCTrainer",
    "make_mesh",
]
