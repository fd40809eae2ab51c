"""Import shims that make the REFERENCE checkout's training/eval stack
runnable in this environment (torch + cv2 are installed; kornia,
torchgeometry and segmentation_models_pytorch are not).

Used by the pipeline-parity harness (tools/pipeline_parity.py) and the
score-calibration probe: the point of round 3's parity work is to run the
reference's OWN eval/VO/metric code side-by-side with this framework
(VERDICT r2 "Next round" #1), which requires its import graph to resolve.

Shimmed:
- torchgeometry.HomographyWarper  (real implementation via F.grid_sample,
  matching tgm's normalized-coordinates convention; used by the reference
  trainer only on the seg/depth paths)
- segmentation_models_pytorch.losses.dice.DiceLoss (constructor-only stub:
  the reference trainer instantiates it unconditionally,
  KeypointNetwithIOLoss.py:252-254, but keypoint-only training never calls)
- kornia.image_to_tensor / kornia.geometry.transform.resize
  (evaluation/visual_odometry.py:77-80)
- kp2dtiny.models.keypoint_net_vlad (dead import in
  visual_odometry/frontend.py:6 — module was deleted into deprecated/)

NOTE ON PROVENANCE: this file contains no reference code; it recreates the
minimal public API surface of third-party libraries (kornia/tgm/smp) that
the reference imports.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"
REF_SRC = "/root/reference/src"


def _install_torchgeometry():
    if "torchgeometry" in sys.modules:
        return
    import torch
    import torch.nn.functional as F

    tgm = types.ModuleType("torchgeometry")

    class HomographyWarper:
        """tgm.HomographyWarper(h, w, mode): warps src with the normalized
        homography dst->src convention on a [-1,1] meshgrid (the same
        convention the reference's own _warp_homography_batch uses)."""

        def __init__(self, height, width, mode="bilinear",
                     padding_mode="zeros"):
            self.height, self.width = height, width
            self.mode = mode
            self.padding_mode = padding_mode
            ys, xs = torch.meshgrid(
                torch.linspace(-1, 1, height), torch.linspace(-1, 1, width),
                indexing="ij")
            self.grid = torch.stack([xs, ys, torch.ones_like(xs)], dim=-1)

        def __call__(self, patch_src, dst_homo_src):
            B = patch_src.shape[0]
            grid = self.grid.to(patch_src.device, torch.float32)
            g = grid.reshape(1, -1, 3).expand(B, -1, -1)  # (B,HW,3)
            Hm = dst_homo_src.reshape(B, 3, 3).float()
            warped = torch.bmm(g, Hm.transpose(1, 2))
            warped = warped[..., :2] / warped[..., 2:3].clamp(min=1e-8)
            warped = warped.reshape(B, self.height, self.width, 2)
            return F.grid_sample(patch_src.float(), warped, mode=self.mode,
                                 padding_mode=self.padding_mode,
                                 align_corners=True)

    tgm.HomographyWarper = HomographyWarper
    sys.modules["torchgeometry"] = tgm


def _install_smp():
    if "segmentation_models_pytorch" in sys.modules:
        return
    smp = types.ModuleType("segmentation_models_pytorch")
    losses = types.ModuleType("segmentation_models_pytorch.losses")
    dice = types.ModuleType("segmentation_models_pytorch.losses.dice")

    class DiceLoss:
        def __init__(self, mode="multiclass", ignore_index=None, **kw):
            self.mode, self.ignore_index = mode, ignore_index

        def to(self, device):
            return self

        def __call__(self, *a, **kw):
            raise NotImplementedError(
                "smp DiceLoss shim: keypoint-only parity runs never reach "
                "the segmentation loss")

    dice.DiceLoss = DiceLoss
    losses.dice = dice
    smp.losses = losses
    sys.modules["segmentation_models_pytorch"] = smp
    sys.modules["segmentation_models_pytorch.losses"] = losses
    sys.modules["segmentation_models_pytorch.losses.dice"] = dice


def _install_kornia():
    if "kornia" in sys.modules:
        return
    import torch
    import torch.nn.functional as F

    kornia = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    transform = types.ModuleType("kornia.geometry.transform")

    def image_to_tensor(image):
        t = torch.from_numpy(image)
        if t.ndim == 2:
            t = t[None]
        else:
            t = t.permute(2, 0, 1)
        return t

    def resize(img, size, interpolation="bilinear", align_corners=False):
        nd = img.ndim
        if nd == 3:
            img = img[None]
        out = F.interpolate(img, size=tuple(size), mode=interpolation,
                            align_corners=align_corners)
        return out[0] if nd == 3 else out

    kornia.image_to_tensor = image_to_tensor
    transform.resize = resize
    geometry.transform = transform
    kornia.geometry = geometry
    sys.modules["kornia"] = kornia
    sys.modules["kornia.geometry"] = geometry
    sys.modules["kornia.geometry.transform"] = transform


def _install_dead_vlad_module():
    name = "kp2dtiny.models.keypoint_net_vlad"
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    mod.KeypointNet = None  # frontend.py:6 imports but KP2DtinyFrontend
    mod.VGG16_DEFAULT = {}  # never instantiates it on the tiny path
    sys.modules[name] = mod


def install(need_dead_vlad: bool = False) -> None:
    """Install all shims and put the reference on sys.path.

    /root/reference/src first (kp2dtiny as top-level package, matching the
    reference's own sys.path layout), then /root/reference (src.* and
    utils.* namespace packages for the eval code's absolute imports)."""
    _install_torchgeometry()
    _install_smp()
    _install_kornia()
    if need_dead_vlad:
        _install_dead_vlad_module()
    for p in (REF_SRC, REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)


def import_ref_eval():
    """Import the reference eval modules. utils/plot.py resolves
    "src/data/cocostuff24.json" relative to CWD at import time
    (utils/utils.py:62), so the import runs under a temporary chdir to the
    reference root. Returns (keypoints_mod, vo_mod)."""
    import os
    install()
    cwd = os.getcwd()
    try:
        os.chdir(REF_ROOT)
        import src.evaluation.keypoints as ref_kp
        import src.evaluation.visual_odometry as ref_vo
    finally:
        os.chdir(cwd)
    return ref_kp, ref_vo
