from .pe import IcosahedronEncoding, nerf_encoding
from .mlp import RenderMLP
from .unet import RenderUNet
from .gcn import GCNDecoder

__all__ = ["IcosahedronEncoding", "nerf_encoding", "RenderMLP", "RenderUNet", "GCNDecoder"]
