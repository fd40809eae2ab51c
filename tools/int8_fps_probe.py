#!/usr/bin/env python
"""On-chip int8 vs bf16 inference throughput for the flagship model.

The quant stack (quant.int8_execution) promises real int8 x int8 -> int32
MXU convs; the v5e's int8 peak is 2x its bf16 peak, but the flagship is
HBM-bandwidth- and VPU-bound at small channel counts, so whether int8
actually pays on the full multitask forward is an empirical question —
this probe answers it on the real chip with the same chained-scan timing
bench.py uses (slope of two chain lengths, RTT cancelled).

Rows: bf16 (the bench.py headline path), int8 (per-conv calibrated
scales), int8+chain (int8 activations between chained backbone blocks —
the HBM-traffic variant). Writes artifacts/int8_fps_probe.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from nanovs_slam_tpu import quant
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.utils.profiling import chained_device_time

    H, W, B = 240, 320, 128
    on_tpu = jax.default_backend() == "tpu"
    cfg = get_config("N", n_classes=28,
                     dtype="bfloat16" if on_tpu else "float32")
    model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, H, W, 3))
    variables = {"params": params, "batch_stats": batch_stats}

    def apply_fn(v, batch, mutable):
        return model.apply(v, batch, False, mutable=mutable)

    rs = np.random.RandomState(0)
    calib = jnp.asarray(rs.rand(4, H, W, 3).astype(np.float32))
    scales = quant.calibrate_conv_scales(apply_fn, variables, [calib],
                                         max_batches=1)

    def scalar_of(out):
        return sum(v.astype(jnp.float32).sum() for v in out.values())

    def fwd_bf16(x):
        return scalar_of(model.apply(variables, x, False))

    def fwd_int8(x):
        with quant.int8_execution(scales):
            return scalar_of(model.apply(variables, x, False))

    def fwd_int8_chain(x):
        with quant.int8_execution(scales, chain=True):
            return scalar_of(model.apply(variables, x, False))

    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.float32)
    n_lo, n_hi = (5, 30) if on_tpu else (1, 3)
    rows = {"backend": jax.default_backend(), "batch": B,
            "hw": [H, W], "config": "N/28", "ts": time.time()}
    for name, fn in (("bf16", fwd_bf16), ("int8", fwd_int8),
                     ("int8_chain", fwd_int8_chain)):
        dt, rtt = chained_device_time(fn, x, n_lo, n_hi)
        fps = B / dt
        rows[name] = {"ms_per_iter": round(dt * 1e3, 3),
                      "fps": round(fps, 1)}
        print(f"# {name}: {dt * 1e3:.2f} ms/iter -> {fps:.1f} FPS "
              f"(rtt {rtt * 1e3:.1f} ms)", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "int8_fps_probe.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    from bench import wait_for_backend
    if not wait_for_backend():
        print("# backend unreachable; forcing CPU", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
    main()
