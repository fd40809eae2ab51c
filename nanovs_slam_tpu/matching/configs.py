"""LightGlue configs for KP2Dtiny backbones
(reference: lightglue/lightglue_configs.py:1-30 — 4 layers, descriptor dim
32 for S/A variants, 64 for F, 4 heads)."""

from .lightglue import LightGlueConfig

LIGHTGLUE_CONFIGS = {
    "kp2dtiny_S": LightGlueConfig(input_dim=32, descriptor_dim=32,
                                  n_layers=4, num_heads=4),
    "kp2dtiny_A": LightGlueConfig(input_dim=32, descriptor_dim=32,
                                  n_layers=4, num_heads=4),
    "kp2dtiny_F": LightGlueConfig(input_dim=64, descriptor_dim=64,
                                  n_layers=4, num_heads=4),
    "default": LightGlueConfig(),
}
