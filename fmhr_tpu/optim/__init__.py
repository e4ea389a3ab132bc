from .pose import triangulate_keypoints
from .mano_fit import fit_mano_two_hands
from .ham import HamConfig, run_ham

__all__ = [
    "triangulate_keypoints",
    "fit_mano_two_hands",
    "HamConfig",
    "run_ham",
]
