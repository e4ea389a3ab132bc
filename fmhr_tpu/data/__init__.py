from .demo import load_demo_views, load_demo_keypoints2d, DemoViews

__all__ = ["load_demo_views", "load_demo_keypoints2d", "DemoViews"]
from .synthetic import ring_cameras, hand_scene

__all__ += ["ring_cameras", "hand_scene"]
