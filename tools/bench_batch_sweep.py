#!/usr/bin/env python
"""Batch-scaling sweep with per-stage split (VERDICT r2 weak #4: the
B=256 throughput drop was recorded but unexplained).

For each batch size, differential chained timing of (a) the full
inference program (model + Pallas postprocess), (b) the model alone, and
(c) the postprocess alone — so a non-monotonic step in (a) is attributed
to the stage that caused it. Also times the int8 execution path (plain
and chained) at the headline batch.

Usage: python tools/bench_batch_sweep.py [--batches 32 64 96 128 192 256]
Writes artifacts/batch_sweep.json.
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[32, 64, 96, 128, 192, 256])
    ap.add_argument("--int8-batch", type=int, default=128)
    args = ap.parse_args()

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.ops.pallas.postprocess_kernel import \
        fused_postprocess_pallas
    from nanovs_slam_tpu.utils.profiling import chained_device_time

    H, W = 240, 320
    on_tpu = jax.default_backend() == "tpu"
    cfg = get_config("N", n_classes=28,
                     dtype="bfloat16" if on_tpu else "float32")
    model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, H, W, 3))
    variables = {"params": params, "batch_stats": batch_stats}
    n_lo, n_hi = (5, 30) if on_tpu else (1, 2)

    def full(x):
        out = model.apply(variables, x, False)
        score, coord, desc = fused_postprocess_pallas(
            out["score"], out["coord"], out["feat"], H, W, cfg.cell,
            cfg.cross_ratio)
        seg = jnp.argmax(out["seg"], -1)
        return (score.sum() + coord.sum() + desc.sum()
                + seg.astype(jnp.float32).sum()
                + out["vlad"].astype(jnp.float32).sum())

    def model_only(x):
        out = model.apply(variables, x, False)
        return sum(v.astype(jnp.float32).sum() for v in out.values())

    results = {"batches": {}}
    Hc, Wc = H // cfg.cell, W // cfg.cell
    Hf, Wf = H // (cfg.cell // 2), W // (cfg.cell // 2)
    for B in args.batches:
        x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                              jnp.float32)
        dt_full, _ = chained_device_time(full, x, n_lo, n_hi)
        dt_model, _ = chained_device_time(model_only, x, n_lo, n_hi)

        # postprocess alone on synthetic head outputs of the right shapes
        dt_f = jnp.bfloat16 if on_tpu else jnp.float32
        sc = jax.random.uniform(jax.random.PRNGKey(2), (B, Hc, Wc, 1),
                                dt_f)

        def post_only(s):
            co = jnp.zeros((B, Hc, Wc, 2), dt_f)
            fe = jnp.ones((B, Hf, Wf, cfg.nfeatures), dt_f)
            a, b, c = fused_postprocess_pallas(s, co, fe, H, W, cfg.cell,
                                               cfg.cross_ratio)
            return a.sum() + b.sum() + c.sum()

        dt_post, _ = chained_device_time(post_only, sc, n_lo, n_hi)
        row = {"ms_full": dt_full * 1e3, "ms_model": dt_model * 1e3,
               "ms_post_alone": dt_post * 1e3,
               "fps": B / dt_full,
               "ms_per_sample_full": dt_full * 1e3 / B,
               "ms_per_sample_model": dt_model * 1e3 / B}
        results["batches"][B] = row
        print(f"B={B}: full {row['ms_full']:.2f} ms ({row['fps']:.0f} FPS)"
              f" | model {row['ms_model']:.2f} | post {row['ms_post_alone']:.2f}"
              f" | per-sample {row['ms_per_sample_full']*1000:.1f} us",
              flush=True)

    # int8 plain vs chained at the headline batch
    if on_tpu:
        from nanovs_slam_tpu import quant
        from nanovs_slam_tpu.quant import calibrate_conv_scales

        B = args.int8_batch
        x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                              jnp.float32)

        def apply_fn(v, b, mutable):
            return model.apply(v, b, False, mutable=mutable)

        scales = calibrate_conv_scales(apply_fn, variables, [x[:8]],
                                       max_batches=1)

        def full_int8_plain(xx):
            with quant.int8_execution(scales, chain=False):
                return full(xx)

        def full_int8_chain(xx):
            with quant.int8_execution(scales, chain=True):
                return full(xx)

        dt_p, _ = chained_device_time(full_int8_plain, x, n_lo, n_hi)
        dt_c, _ = chained_device_time(full_int8_chain, x, n_lo, n_hi)
        dt_b, _ = chained_device_time(full, x, n_lo, n_hi)
        results["int8"] = {
            "batch": B,
            "ms_bf16": dt_b * 1e3, "fps_bf16": B / dt_b,
            "ms_int8_plain": dt_p * 1e3, "fps_int8_plain": B / dt_p,
            "ms_int8_chained": dt_c * 1e3, "fps_int8_chained": B / dt_c,
            "chained_vs_bf16": dt_b / dt_c,
        }
        print(f"int8 @B={B}: bf16 {dt_b*1e3:.2f} ms | plain int8 "
              f"{dt_p*1e3:.2f} ms | chained int8 {dt_c*1e3:.2f} ms "
              f"({dt_b/dt_c:.3f}x vs bf16)", flush=True)

    os.makedirs(os.path.join(_REPO, "artifacts"), exist_ok=True)
    out = os.path.join(_REPO, "artifacts", "batch_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
