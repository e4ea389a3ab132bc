from .config import Config, load_config
from .obj_io import load_obj, save_obj, save_obj_with_colors
from .metrics import psnr, psnr_reference, ssim

__all__ = [
    "Config",
    "load_config",
    "load_obj",
    "save_obj",
    "save_obj_with_colors",
    "psnr",
    "psnr_reference",
    "ssim",
]
