"""Probe: where offline-VO wall time actually goes on the tunneled chip.

artifacts/offline_batch_probe.json leaves ~650 ms/sequence unaccounted
(wall 1442.6 vs pose_map 713.5 + match_map 48.7 + ~40 ms extraction).
Naive stage timing is impossible here: on the tunneled PJRT backend
`block_until_ready` can return before execution finishes (the reason
bench.py uses chained-scan timing), so this probe measures DIFFERENTIAL
end-to-end walls — each variant runs from host frames to a host-fetched
result (np.asarray of a scalar slice forces the full sync without
transfer cost), and stage costs are differences between variants:

  prefix1 = transfer + extract          (fetch fmap scalar)
  prefix2 = prefix1 + match_map         (fetch kpn scalar)
  prefix3 = prefix2 + pose_map          (fetch R/t/ninl/nmat — shipped
                                         relative_poses, minus numpy())
  fused   = single-program u8 extract (normalize in-graph) + match +
            pose — the candidate dispatch-count fix

Usage: python tools/offline_wall_probe.py [--reps 3]
Writes artifacts/offline_wall_probe.json.
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.matching.dense import _l2n
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.vo.camera import PinholeCamera
    from nanovs_slam_tpu.vo.offline import OfflineVO

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    cfg = get_config("N", n_classes=28,
                     dtype="bfloat16" if on_tpu else "float32")
    model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, 128, 512, 3))
    variables = {"params": params, "batch_stats": batch_stats}

    T, Hv, Wv = 30, 128, 512
    rs = np.random.RandomState(0)
    frames = rs.rand(T, Hv, Wv, 3).astype(np.float32)
    frames_u8 = (frames * 255).astype(np.uint8)
    cam = PinholeCamera(Wv, Hv, 350.0, 350.0, Wv / 2, Hv / 2)
    ovo = OfflineVO(model, cfg, variables, (Hv, Wv), cam, restarts=3)
    key = jax.random.PRNGKey(0)

    out = {"backend": backend, "frames": T, "reps": args.reps}

    def timed(fn, label):
        fn()  # warm (compile)
        t0 = time.time()
        for _ in range(args.reps):
            fn()
        ms = (time.time() - t0) / args.reps * 1e3
        out[label] = round(ms, 1)
        print(f"{label}: {ms:.1f} ms", flush=True)
        path = os.path.join(_REPO, "artifacts", "offline_wall_probe.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    # prefix 1: transfer + extract, forced by a scalar fetch
    def p1():
        fm = ovo.extract(frames)
        return np.asarray(fm[0, 0, 0, 0])

    timed(p1, "prefix_extract_ms")

    # prefix 2: + match map
    def p2():
        fm = ovo.extract(frames)
        kpn0, kpn1, valid = ovo._match_map(fm)
        return np.asarray(kpn0[0, 0, 0])

    timed(p2, "prefix_match_ms")

    # prefix 3: + pose map == shipped relative_poses
    def p3():
        fm = ovo.extract(frames)
        kpn0, kpn1, valid = ovo._match_map(fm)
        R, t, ninl, nmat = ovo._pose_map(kpn0, kpn1, valid, key)
        return (np.asarray(R), np.asarray(t), np.asarray(ninl),
                np.asarray(nmat))

    timed(p3, "prefix_pose_ms")

    # candidate fix: ONE extract dispatch (u8 in, normalize in-graph,
    # whole padded sequence one program) replacing
    # transfer+normalize+chunks+concat
    pad = (-T) % 16
    fu8 = np.concatenate([frames_u8] + [frames_u8[-1:]] * pad)
    ff32 = np.concatenate([frames] + [frames[-1:]] * pad)

    @jax.jit
    def extract_fused(variables, raw_u8):
        x = raw_u8.astype(jnp.float32) / 255.0
        x = (x - 0.5) * 2.0
        o = model.apply(variables, x, False, False, ("desc",))
        return _l2n(o["feat"])

    def pf():
        fm = extract_fused(variables, jnp.asarray(fu8))[:T]
        kpn0, kpn1, valid = ovo._match_map(fm)
        R, t, ninl, nmat = ovo._pose_map(kpn0, kpn1, valid, key)
        return (np.asarray(R), np.asarray(t), np.asarray(ninl),
                np.asarray(nmat))

    timed(pf, "fused_u8_full_ms")

    # control: same single dispatch + in-graph normalize but f32
    # transfer — separates the transfer-size saving (u8 is 4x smaller
    # over the tunnel) from the dispatch-count saving
    @jax.jit
    def extract_fused_f32(variables, raw01):
        x = (raw01 - 0.5) * 2.0
        o = model.apply(variables, x, False, False, ("desc",))
        return _l2n(o["feat"])

    def pf32():
        fm = extract_fused_f32(variables, jnp.asarray(ff32))[:T]
        kpn0, kpn1, valid = ovo._match_map(fm)
        R, t, ninl, nmat = ovo._pose_map(kpn0, kpn1, valid, key)
        return (np.asarray(R), np.asarray(t), np.asarray(ninl),
                np.asarray(nmat))

    timed(pf32, "fused_f32_full_ms")

    # derived stage costs
    out["derived_match_ms"] = round(
        out["prefix_match_ms"] - out["prefix_extract_ms"], 1)
    out["derived_pose_ms"] = round(
        out["prefix_pose_ms"] - out["prefix_match_ms"], 1)
    out["fused_gain_ms"] = round(
        out["prefix_pose_ms"] - out["fused_u8_full_ms"], 1)
    print(json.dumps(out, indent=1), flush=True)
    path = os.path.join(_REPO, "artifacts", "offline_wall_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
