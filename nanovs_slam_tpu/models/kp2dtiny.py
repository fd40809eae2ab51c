"""KP2DTiny models, TPU-native.

Behavioral contract (reference: src/kp2dtiny/models/kp2dtiny.py):

- KP2DTinyV2 ("dedicated decoders", :284-647): shared BackBone + 5 heads:
  score (sigmoid, 1ch), loc (tanh, 2ch), dense descriptors (UpscaleHead),
  segmentation (SegmentationHead[ATT]), VPR (VPRHead), optional depth
  (sigmoid). Forward (:552-591) returns raw dense maps; postprocessing
  (coord decode, border mask, descriptor sampling) is a separate pure
  function here (ops/postprocess.py) so inference can fuse it into one
  jitted program.

- KP2DTinyV3 ("decoder fusion", :650-1015): fused 3-channel score+loc head
  (:927-935) and fused seg+feat(+depth) head (:936-940). At eval the
  reference applies softmax to seg inside forward (:942-943); we expose
  that via the train flag.

Outputs are NHWC: score (B,Hc,Wc,1), coord = tanh shift (B,Hc,Wc,2),
feat (B,Hs,Ws,nfeat), seg (B,Hs,Ws,nCls), vlad (B,D), depth (B,Hs,Ws,1)
where Hc = H/cell and Hs = 2*Hc (skip resolution).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import KP2DTinyConfig, get_config
from ..modules.backbone import BackBone
from ..modules.heads import SimpleTaskHead, UpscaleHead
from ..modules.segmentation import (
    SegmentationFeatHeadLight,
    SegmentationFeatHeadLightATT,
    SegmentationHead,
    SegmentationHeadATT,
)
from ..modules.vpr import VPRHead


class KP2DTinyV2(nn.Module):
    cfg: KP2DTinyConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 only_encoder: bool = False,
                 heads: tuple = ("score", "loc", "desc", "seg", "vlad"),
                 ) -> Dict[str, jnp.ndarray]:
        """only_encoder=True returns the dense L2-normalized VPR encoder
        features (kp2dtiny.py:515-518), used for NetVLAD k-means init.

        heads: which task heads to compute — a TPU-native extension: a VO
        pipeline without the semantic filter skips seg+vlad (~40% of model
        FLOPs). Initialize with the full tuple so all params exist."""
        cfg = self.cfg
        c1, c2, c3, c4, c5, d1 = cfg.channel_dims
        dtype = cfg.compute_dtype
        x = x.astype(dtype)

        feat_x, skip = BackBone(
            c1, c2, c3, c4, cfg.downsample, cfg.with_drop, cfg.bn_momentum,
            cfg.leaky_relu, dtype, name="backbone")(x, train)

        if only_encoder:
            return VPRHead(cfg.enc_dim, cfg.num_clusters, cfg.with_drop,
                           cfg.bn_momentum, cfg.remove_netvlad,
                           cfg.leaky_relu, cfg.global_descriptor_method,
                           dtype, name="vlad_head")(feat_x,
                                                    only_encoder=True)

        out: Dict[str, jnp.ndarray] = {}
        if "score" in heads:
            score = SimpleTaskHead(c4, 1, cfg.bn_momentum, cfg.with_drop,
                                   cfg.leaky_relu, dtype,
                                   name="score_head")(feat_x, train)
            out["score"] = nn.sigmoid(score)
        if "loc" in heads:
            shift = SimpleTaskHead(c4, 2, cfg.bn_momentum, cfg.with_drop,
                                   cfg.leaky_relu, dtype,
                                   name="loc_head")(feat_x, train)
            out["coord"] = nn.tanh(shift)

        # Descriptor head channel plan (kp2dtiny.py:377-388):
        # convA c4->c4, convB c4->c3*4, pixelshuffle -> c3, cat skip (c3+c4),
        # convAa -> c4, convBb -> nfeatures.
        if "desc" in heads:
            out["feat"] = UpscaleHead(
                c4, c3 * 4, c4, cfg.nfeatures, cfg.with_drop,
                cfg.bn_momentum, cfg.upscale_method, cfg.leaky_relu, dtype,
                name="desc_head")(feat_x, skip, train)

        seg_cls = SegmentationHeadATT if cfg.use_attention else SegmentationHead
        if "seg" in heads:
            out["seg"] = seg_cls(c5, cfg.n_classes, d1, cfg.with_drop,
                                 cfg.bn_momentum, cfg.upscale_method,
                                 cfg.leaky_relu, dtype,
                                 name="seg_head")(feat_x, skip, train)

        if "vlad" in heads:
            out["vlad"] = VPRHead(
                cfg.enc_dim, cfg.num_clusters, cfg.with_drop,
                cfg.bn_momentum, cfg.remove_netvlad, cfg.leaky_relu,
                cfg.global_descriptor_method, dtype,
                name="vlad_head")(feat_x, train=train)

        if cfg.depth:
            depth = seg_cls(c5, 1, d1, cfg.with_drop, cfg.bn_momentum,
                            cfg.upscale_method, cfg.leaky_relu, dtype,
                            name="depth_head")(feat_x, skip, train)
            out["depth"] = nn.sigmoid(depth)
        return out


class KP2DTinyV3(nn.Module):
    cfg: KP2DTinyConfig
    apply_eval_softmax: bool = True  # seg softmax in fwd at eval (:942-943)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 only_encoder: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        c1, c2, c3, c4, c5, d1 = cfg.channel_dims
        dtype = cfg.compute_dtype
        x = x.astype(dtype)

        # NOTE: the reference V3 hardcodes backbone bn_momentum=0.1
        # (kp2dtiny.py:732-742) while heads use cfg value; both are 0.1 in
        # every shipped config, so we use cfg.bn_momentum throughout.
        feat_x, skip = BackBone(
            c1, c2, c3, c4, cfg.downsample, cfg.with_drop, cfg.bn_momentum,
            cfg.leaky_relu, dtype, name="backbone")(x, train)

        if only_encoder:
            return VPRHead(cfg.enc_dim, cfg.num_clusters, cfg.with_drop,
                           cfg.bn_momentum, cfg.remove_netvlad,
                           cfg.leaky_relu, cfg.global_descriptor_method,
                           dtype, name="vlad_head")(feat_x,
                                                    only_encoder=True)

        score_loc = SimpleTaskHead(c4, 3, cfg.bn_momentum, cfg.with_drop,
                                   cfg.leaky_relu, dtype,
                                   name="score_loc_head")(feat_x, train)
        score = nn.sigmoid(score_loc[..., 0:1])
        shift = nn.tanh(score_loc[..., 1:3])

        seg_cls = (SegmentationFeatHeadLightATT if cfg.use_attention
                   else SegmentationFeatHeadLight)
        seg_out = seg_cls(c5, cfg.n_classes, cfg.nfeatures, d1, cfg.with_drop,
                          cfg.bn_momentum, cfg.upscale_method, cfg.leaky_relu,
                          cfg.depth, dtype,
                          name="seg_head")(feat_x, skip, train)
        if cfg.depth:
            seg, feat, depth = seg_out
        else:
            seg, feat = seg_out

        if not train and self.apply_eval_softmax:
            seg = nn.softmax(seg, axis=-1)

        vlad = VPRHead(cfg.enc_dim, cfg.num_clusters, cfg.with_drop,
                       cfg.bn_momentum, cfg.remove_netvlad, cfg.leaky_relu,
                       cfg.global_descriptor_method, dtype,
                       name="vlad_head")(feat_x, train=train)

        out = {"score": score, "coord": shift, "feat": feat, "seg": seg,
               "vlad": vlad}
        if cfg.depth:
            out["depth"] = nn.sigmoid(depth)
        return out


def build_model(cfg: KP2DTinyConfig) -> nn.Module:
    return KP2DTinyV3(cfg) if cfg.variant == "v3" else KP2DTinyV2(cfg)


def tiny_factory(config: str, n_classes: int, *, to_mcu: bool = False,
                 to_export: bool = False, v3: bool = False,
                 dtype: str = "float32", depth: bool = False) -> nn.Module:
    """Create a model by config name (reference tiny_factory,
    kp2dtiny.py:221-242)."""
    cfg = get_config(config, v3=v3, n_classes=n_classes, to_mcu=to_mcu,
                     to_export=to_export, dtype=dtype, depth=depth)
    return build_model(cfg)


def init_model(model: nn.Module, rng: jax.Array, input_shape=(1, 240, 320, 3)):
    """Initialize variables; returns (params, batch_stats)."""
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros(input_shape, jnp.float32), True)
    return variables["params"], variables.get("batch_stats", {})
