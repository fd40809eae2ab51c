from .blocks import ConvBNAct, TransposedConvUpsample, pixel_shuffle, pixel_unshuffle, l2_normalize  # noqa: F401
from .backbone import BackBone  # noqa: F401
from .heads import SimpleTaskHead, UpscaleHead  # noqa: F401
from .attention import SegFormerAttentionModule  # noqa: F401
from .segmentation import (  # noqa: F401
    SegmentationHead,
    SegmentationHeadATT,
    SegmentationFeatHeadLight,
    SegmentationFeatHeadLightATT,
)
from .aggregators import NetVLAD, GeM, ConvAP  # noqa: F401
from .vpr import VPRHead  # noqa: F401
