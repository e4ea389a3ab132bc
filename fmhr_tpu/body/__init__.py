from .mano import ManoModel, mano_forward, lbs, lbs_tpose, MANO_TIP_VERTEX_IDS, MANO_JOINT_REORDER
from .synthetic import synthetic_hand_model

__all__ = [
    "ManoModel",
    "mano_forward",
    "lbs",
    "lbs_tpose",
    "MANO_TIP_VERTEX_IDS",
    "MANO_JOINT_REORDER",
    "synthetic_hand_model",
]
