from .postprocess_kernel import fused_postprocess_pallas  # noqa: F401
from .netvlad_kernel import netvlad_pallas  # noqa: F401
