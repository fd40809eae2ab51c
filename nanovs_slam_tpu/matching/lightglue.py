"""LightGlue matcher, TPU-native (fixed-shape, masked, jittable).

Behavioral contract (reference: lightglue/lightglue.py):
- keypoint normalization (:134-145), learnable Fourier positional encoding
  + rotary application (:148-171)
- per-layer Self (rotary qkv, :237-269) + Cross (:272-327) attention blocks
  with a shared cat([x, message]) FFN
- matchability + double-softmax log-assignment
  (sigmoid_log_double_softmax :362-374, MatchAssignment :377-396)
- mutual-NN + threshold match filtering (filter_matches :399-415)
- TokenConfidence heads (:174-200) and the NLL training loss with per-layer
  deep supervision (weight_loss :10-29, NLLLoss :32-77, loss :646-695)

TPU-first design decisions:
- FIXED shapes everywhere: keypoints are padded to (B, N) with boolean
  validity masks; padded keys get -inf attention logits and are excluded
  from the assignment by masking the similarity matrix. This replaces the
  reference's dynamic-shape masked_forward / nan_to_num path (:353-359) and
  its gather/scatter width pruning (:564-594), which are TPU-hostile.
- Adaptive depth (early exit, :560-563,:627-638) is expressed as a
  lax.while_loop over layers carrying full-size descriptors — the
  confidence predicate stops iterating without changing shapes. Off by
  default (static depth compiles to the fastest code at n_layers=4).
- All matmuls run on the MXU via einsum with f32 accumulation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jnp.ndarray
NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class LightGlueConfig:
    input_dim: int = 256
    descriptor_dim: int = 256
    n_layers: int = 9
    num_heads: int = 4
    add_scale_ori: bool = False
    filter_threshold: float = 0.0
    depth_confidence: float = -1.0  # >0 enables early exit at inference
    # >0 enables adaptive width pruning at inference (reference
    # :564-594); consumed by matching/width_pruning.width_pruned_forward
    # (static bucket compaction), not by the plain __call__
    width_confidence: float = -1.0
    nll_balancing: float = 0.5
    loss_gamma: float = 1.0
    dtype: Any = jnp.float32


def normalize_keypoints(kpts: Array, size) -> Array:
    """(lightglue.py:134-145). kpts (B, N, 2); size (w, h) or (B, 2)."""
    size = jnp.asarray(size, kpts.dtype)
    if size.ndim == 1:
        size = size[None]
    shift = size / 2.0
    scale = jnp.max(size, axis=-1) / 2.0
    return (kpts - shift[:, None, :]) / scale[:, None, None]


def rotate_half(x: Array) -> Array:
    x = x.reshape(x.shape[:-1] + (-1, 2))
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape[:-2] + (-1,))


def apply_rotary(enc: Tuple[Array, Array], t: Array) -> Array:
    """enc = (cos, sin) each (B, 1, N, head_dim); t (B, H, N, head_dim)."""
    return t * enc[0] + rotate_half(t) * enc[1]


class FourierPositionalEncoding(nn.Module):
    """Learnable Fourier features -> rotary (cos, sin) pair (:158-171)."""

    head_dim: int
    gamma: float = 1.0

    @nn.compact
    def __call__(self, kpts: Array) -> Tuple[Array, Array]:
        M = kpts.shape[-1]
        Wr = self.param("Wr", nn.initializers.normal(self.gamma ** -2),
                        (M, self.head_dim // 2), jnp.float32)
        projected = kpts @ Wr  # (B, N, head_dim//2)
        cos = jnp.cos(projected)
        sin = jnp.sin(projected)
        # repeat_interleave(2, -1): [c0, c0, c1, c1, ...]
        cos = jnp.repeat(cos, 2, axis=-1)[:, None]  # (B, 1, N, head_dim)
        sin = jnp.repeat(sin, 2, axis=-1)[:, None]
        return cos, sin


def masked_softmax(logits: Array, mask: Optional[Array], axis: int = -1
                   ) -> Array:
    """softmax with invalid entries masked out; fully-masked rows -> 0."""
    if mask is None:
        return jax.nn.softmax(logits, axis=axis)
    logits = jnp.where(mask, logits, NEG_INF)
    out = jax.nn.softmax(logits, axis=axis)
    any_valid = jnp.any(mask, axis=axis, keepdims=True)
    return jnp.where(any_valid, out, 0.0)


class FFN(nn.Module):
    """cat([x, message]) -> Linear(2d) -> LayerNorm -> GELU -> Linear(d),
    residual added by caller (:249-254)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, message: Array) -> Array:
        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * self.dim, dtype=self.dtype, name="fc1")(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class SelfBlock(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, enc: Tuple[Array, Array],
                 mask: Optional[Array] = None) -> Array:
        B, N, d = x.shape
        h, dh = self.heads, self.dim // self.heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="Wqkv")(x)
        # torch packing: channel = h * (dh * 3) + dh_idx * 3 + {q,k,v}
        qkv = qkv.reshape(B, N, h, dh, 3).transpose(0, 2, 1, 3, 4)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        q = apply_rotary(enc, q)
        k = apply_rotary(enc, k)
        s = dh ** -0.5
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32) * s
        key_mask = None if mask is None else mask[:, None, None, :]  # (B,1,1,N)
        attn = masked_softmax(sim, key_mask).astype(v.dtype)
        ctx = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, d)
        message = nn.Dense(d, dtype=self.dtype, name="out_proj")(ctx)
        return x + FFN(self.dim, self.dtype, name="ffn")(x, message)


class CrossBlock(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0: Array, x1: Array,
                 mask0: Optional[Array] = None,
                 mask1: Optional[Array] = None) -> Tuple[Array, Array]:
        B, M, d = x0.shape
        N = x1.shape[1]
        h, dh = self.heads, self.dim // self.heads
        to_qk = nn.Dense(d, dtype=self.dtype, name="to_qk")
        to_v = nn.Dense(d, dtype=self.dtype, name="to_v")
        to_out = nn.Dense(d, dtype=self.dtype, name="to_out")
        ffn = FFN(self.dim, self.dtype, name="ffn")

        def split(t, n):
            return t.reshape(B, n, h, dh).transpose(0, 2, 1, 3)

        qk0 = split(to_qk(x0), M)
        qk1 = split(to_qk(x1), N)
        v0 = split(to_v(x0), M)
        v1 = split(to_v(x1), N)
        s = dh ** -0.5
        sim = jnp.einsum("bhid,bhjd->bhij", qk0 * s ** 0.5, qk1 * s ** 0.5,
                         preferred_element_type=jnp.float32)
        m1k = None if mask1 is None else mask1[:, None, None, :]
        m0k = None if mask0 is None else mask0[:, None, None, :]
        attn01 = masked_softmax(sim, m1k, axis=-1).astype(v1.dtype)
        attn10 = masked_softmax(
            jnp.swapaxes(sim, -1, -2), m0k, axis=-1).astype(v0.dtype)
        msg0 = jnp.einsum("bhij,bhjd->bhid", attn01, v1,
                          preferred_element_type=jnp.float32).astype(x0.dtype)
        msg1 = jnp.einsum("bhij,bhjd->bhid", attn10, v0,
                          preferred_element_type=jnp.float32).astype(x1.dtype)
        msg0 = to_out(msg0.transpose(0, 2, 1, 3).reshape(B, M, d))
        msg1 = to_out(msg1.transpose(0, 2, 1, 3).reshape(B, N, d))
        x0 = x0 + ffn(x0, msg0)
        x1 = x1 + ffn(x1, msg1)
        return x0, x1


class TransformerLayer(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, desc0, desc1, enc0, enc1, mask0=None, mask1=None):
        sa = SelfBlock(self.dim, self.heads, self.dtype, name="self_attn")
        desc0 = sa(desc0, enc0, mask0)
        desc1 = sa(desc1, enc1, mask1)
        return CrossBlock(self.dim, self.heads, self.dtype,
                          name="cross_attn")(desc0, desc1, mask0, mask1)


class MatchAssignment(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    def setup(self):
        self.matchability = nn.Dense(1, dtype=self.dtype)
        self.final_proj = nn.Dense(self.dim, dtype=self.dtype)

    def __call__(self, desc0: Array, desc1: Array,
                 mask0: Optional[Array] = None,
                 mask1: Optional[Array] = None) -> Tuple[Array, Array]:
        """-> (log assignment (B, M+1, N+1), sim)."""
        mdesc0 = self.final_proj(desc0) / self.dim ** 0.25
        mdesc1 = self.final_proj(desc1) / self.dim ** 0.25
        sim = jnp.einsum("bmd,bnd->bmn", mdesc0, mdesc1,
                         preferred_element_type=jnp.float32)
        z0 = self.matchability(desc0)  # (B, M, 1)
        z1 = self.matchability(desc1)
        scores = sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1)
        return scores, sim

    def get_matchability(self, desc: Array) -> Array:
        return jax.nn.sigmoid(self.matchability(desc))[..., 0]


def sigmoid_log_double_softmax(sim: Array, z0: Array, z1: Array,
                               mask0: Optional[Array] = None,
                               mask1: Optional[Array] = None) -> Array:
    """(:362-374) with optional validity masking of padded keypoints."""
    B, M, N = sim.shape
    if mask0 is not None:
        sim = jnp.where(mask0[:, :, None], sim, NEG_INF)
    if mask1 is not None:
        sim = jnp.where(mask1[:, None, :], sim, NEG_INF)
    certainties = (jax.nn.log_sigmoid(z0)
                   + jnp.swapaxes(jax.nn.log_sigmoid(z1), 1, 2))
    scores0 = jax.nn.log_softmax(sim, axis=2)
    scores1 = jax.nn.log_softmax(sim, axis=1)
    scores = jnp.zeros((B, M + 1, N + 1), sim.dtype)
    scores = scores.at[:, :M, :N].set(scores0 + scores1 + certainties)
    scores = scores.at[:, :-1, -1].set(jax.nn.log_sigmoid(-z0[..., 0]))
    scores = scores.at[:, -1, :-1].set(jax.nn.log_sigmoid(-z1[..., 0]))
    return scores


def filter_matches(scores: Array, th: float,
                   mask0: Optional[Array] = None,
                   mask1: Optional[Array] = None):
    """(:399-415); -> (m0, m1, mscores0, mscores1), fixed shapes, -1 = no
    match. Padded keypoints (mask False) never match."""
    inner = scores[:, :-1, :-1]
    m0 = jnp.argmax(inner, axis=2)
    m1 = jnp.argmax(inner, axis=1)
    max0 = jnp.max(inner, axis=2)
    B, M = m0.shape
    N = m1.shape[1]
    idx0 = jnp.arange(M)[None]
    idx1 = jnp.arange(N)[None]
    mutual0 = idx0 == jnp.take_along_axis(m1, m0, axis=1)
    mutual1 = idx1 == jnp.take_along_axis(m0, m1, axis=1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(mutual1,
                         jnp.take_along_axis(mscores0, m1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > th)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, axis=1)
    if mask0 is not None:
        valid0 = valid0 & mask0
        valid1 = valid1 & jnp.take_along_axis(mask0, m1, axis=1)
    if mask1 is not None:
        valid0 = valid0 & jnp.take_along_axis(mask1, m0, axis=1)
        valid1 = valid1 & mask1
    m0 = jnp.where(valid0, m0, -1)
    m1 = jnp.where(valid1, m1, -1)
    return m0, m1, mscores0, mscores1


class TokenConfidence(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, desc0: Array, desc1: Array) -> Tuple[Array, Array]:
        token = nn.Dense(1, dtype=self.dtype, name="token")
        t0 = jax.nn.sigmoid(token(jax.lax.stop_gradient(desc0)))[..., 0]
        t1 = jax.nn.sigmoid(token(jax.lax.stop_gradient(desc1)))[..., 0]
        return t0, t1


class LightGlue(nn.Module):
    cfg: LightGlueConfig

    def setup(self):
        cfg = self.cfg
        d = cfg.descriptor_dim
        if cfg.input_dim != d:
            self.input_proj = nn.Dense(d, dtype=cfg.dtype,
                                       name="input_proj")
        self.posenc = FourierPositionalEncoding(d // cfg.num_heads,
                                                name="posenc")
        # explicit names keep the param paths of the compact implementation
        # (and the torch-import name mapping) stable
        self.layers = [TransformerLayer(d, cfg.num_heads, cfg.dtype,
                                        name=f"transformers_{i}")
                       for i in range(cfg.n_layers)]
        self.assigners = [MatchAssignment(d, cfg.dtype,
                                          name=f"log_assignment_{i}")
                          for i in range(cfg.n_layers)]
        self.confidences = [TokenConfidence(cfg.dtype,
                                            name=f"token_confidence_{i}")
                            for i in range(cfg.n_layers - 1)]

    # --- staged methods (the host-selected adaptive-depth runner jits
    # each stage separately; see AdaptiveLightGlue) ---

    def embed(self, data: Dict[str, Array]):
        """Input projection + positional encoding."""
        desc0, desc1 = data["descriptors0"], data["descriptors1"]
        if self.cfg.input_dim != self.cfg.descriptor_dim:
            desc0, desc1 = self.input_proj(desc0), self.input_proj(desc1)
        enc0 = self.posenc(data["keypoints0"])
        enc1 = self.posenc(data["keypoints1"])
        return desc0, desc1, enc0, enc1

    def run_layer(self, i: int, desc0, desc1, enc0, enc1,
                  mask0=None, mask1=None):
        """One self+cross transformer layer (static i)."""
        return self.layers[i](desc0, desc1, enc0, enc1, mask0, mask1)

    def stop_ratio(self, i: int, desc0, desc1) -> Array:
        """Confident-token ratio after layer i (reference check_if_stop,
        :627-638); early exit when this exceeds depth_confidence."""
        t0, t1 = self.confidences[i](desc0, desc1)
        thr = confidence_threshold(i, self.cfg.n_layers)
        conf = jnp.concatenate([t0, t1], -1)
        return 1.0 - jnp.mean((conf < thr).astype(jnp.float32))

    def matchability(self, i: int, desc) -> Array:
        """sigmoid matchability of layer i's assigner (:577,583) — the
        width-pruning keep signal."""
        return self.assigners[i].get_matchability(desc)

    def token_confidence(self, i: int, desc0, desc1):
        """TokenConfidence head i outputs (used by width pruning's
        low-confidence-points-are-never-pruned rule, :619-624)."""
        return self.confidences[i](desc0, desc1)

    def finalize(self, i: int, desc0, desc1, mask0=None, mask1=None
                 ) -> Dict[str, Array]:
        """Assignment + match filtering with the EXIT layer's assigner —
        the reference uses log_assignment[i] at the early-exit layer
        (:560-563), not the last layer's head."""
        scores, _ = self.assigners[i](desc0, desc1, mask0, mask1)
        m0, m1, ms0, ms1 = filter_matches(scores, self.cfg.filter_threshold,
                                          mask0, mask1)
        return {"matches0": m0, "matches1": m1, "matching_scores0": ms0,
                "matching_scores1": ms1, "log_assignment": scores}

    def __call__(self, data: Dict[str, Array], train: bool = False
                 ) -> Dict[str, Array]:
        """data: keypoints0/1 (B,M,2)/(B,N,2) NORMALIZED (see
        normalize_keypoints), descriptors0/1 (B,M,C)/(B,N,C), optional
        mask0/mask1 boolean validity."""
        cfg = self.cfg
        desc0, desc1, enc0, enc1 = self.embed(data)
        mask0 = data.get("mask0")
        mask1 = data.get("mask1")
        layers = self.layers
        assigners = self.assigners
        confidences = self.confidences

        all_desc0, all_desc1 = [], []
        all_assignments = []
        do_early_stop = cfg.depth_confidence > 0 and not train
        stopped = jnp.asarray(False)
        for i in range(cfg.n_layers):
            if do_early_stop:
                # once stopped, layers become no-ops (value-level early exit;
                # saves nothing in compute but preserves reference outputs).
                new0, new1 = layers[i](desc0, desc1, enc0, enc1, mask0, mask1)
                desc0 = jnp.where(stopped, desc0, new0)
                desc1 = jnp.where(stopped, desc1, new1)
                if i < cfg.n_layers - 1:
                    t0, t1 = confidences[i](desc0, desc1)
                    thr = confidence_threshold(i, cfg.n_layers)
                    conf = jnp.concatenate([t0, t1], -1)
                    ratio = 1.0 - jnp.mean((conf < thr).astype(jnp.float32))
                    stopped = stopped | (ratio > cfg.depth_confidence)
            else:
                desc0, desc1 = layers[i](desc0, desc1, enc0, enc1,
                                         mask0, mask1)
            if train or i == cfg.n_layers - 1:
                all_desc0.append(desc0)
                all_desc1.append(desc1)
            if train and i < cfg.n_layers - 1:
                # materialize every layer's assignment (deep supervision,
                # reference loss :646-656) and confidence head params
                la_i, _ = assigners[i](desc0, desc1, mask0, mask1)
                all_assignments.append(la_i)
                confidences[i](desc0, desc1)

        scores, _ = assigners[cfg.n_layers - 1](desc0, desc1, mask0, mask1)
        all_assignments.append(scores)
        m0, m1, ms0, ms1 = filter_matches(scores, cfg.filter_threshold,
                                          mask0, mask1)
        pred = {
            "matches0": m0, "matches1": m1,
            "matching_scores0": ms0, "matching_scores1": ms1,
            "ref_descriptors0": jnp.stack(all_desc0, 1),
            "ref_descriptors1": jnp.stack(all_desc1, 1),
            "log_assignment": scores,
        }
        if train:
            pred["all_log_assignments"] = jnp.stack(all_assignments, 1)
        return pred



def confidence_threshold(layer_index: int, n_layers: int) -> float:
    """(:613-616)"""
    return float(np.clip(0.8 + 0.1 * np.exp(-4.0 * layer_index / n_layers),
                         0, 1))


def inference_forward(model: "LightGlue", params,
                      data: Dict[str, Array]) -> Dict[str, Array]:
    """Config-dispatched inference entry: in the reference, width
    pruning engages automatically whenever `width_confidence` is
    configured (lightglue.py:564-594,613-624) — this is the analog seam
    for consumers that hold a (model, params) pair (the VO loop, eval
    CLIs). cfg.width_confidence > 0 dispatches to
    width_pruning.engaged_width_forward: one keep-count probe fetch
    selects the static-bucket schedule floor, so fully-matchable pairs
    run the plain program (the reference's automatic no-op, :613-624)
    and junk-heavy pairs keep the compaction speedup. Host-staged
    adaptive DEPTH
    (cfg.depth_confidence) requires a host-read scalar per layer and
    stays an explicit opt-in (matching/adaptive.py)."""
    if model.cfg.width_confidence > 0:
        from .width_pruning import engaged_width_forward

        return engaged_width_forward(model, params, data,
                                     model.cfg.width_confidence)
    return model.apply({"params": params}, data)


def assignment_at_layer(params: Dict, layer: int, desc0: Array,
                        desc1: Array, mask0: Optional[Array] = None,
                        mask1: Optional[Array] = None) -> Array:
    """Functional re-run of log_assignment_{layer} on stored descriptors
    (used by the deep-supervision training loss, reference loss :646-656).
    Operates directly on the params subtree (two Dense layers), avoiding a
    second module method."""
    p = params[f"log_assignment_{layer}"]
    fp, mb = p["final_proj"], p["matchability"]
    d = fp["kernel"].shape[1]
    mdesc0 = (desc0 @ fp["kernel"] + fp["bias"]) / d ** 0.25
    mdesc1 = (desc1 @ fp["kernel"] + fp["bias"]) / d ** 0.25
    sim = jnp.einsum("bmd,bnd->bmn", mdesc0, mdesc1,
                     preferred_element_type=jnp.float32)
    z0 = desc0 @ mb["kernel"] + mb["bias"]
    z1 = desc1 @ mb["kernel"] + mb["bias"]
    return sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1)
