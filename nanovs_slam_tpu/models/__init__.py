from .kp2dtiny import KP2DTinyV2, KP2DTinyV3, build_model, tiny_factory  # noqa: F401
