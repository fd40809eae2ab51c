#!/usr/bin/env python
"""Pin an orbax checkpoint as a single git-committable .npz file.

VERDICT r4 next #3: quality evidence kept evaporating because the
environment wipes gitignored dirs (model_ckpt/, fixtures/) between
rounds, and the 1500-epoch/8000-step regeneration runs move headline
numbers. A pinned f32 .npz of the canonical weights (a few MB) anchors
every quality artifact permanently; utils/checkpoint.load_checkpoint
accepts the .npz anywhere an orbax dir is accepted (--model_path,
--lg_ckpt, ...). The reference's own weights-by-email gap
(/root/reference/README.md:220-221) is exactly what NOT to replicate.

Usage:
  python tools/pin_checkpoint.py model_ckpt/r5_long pinned/extractor_S.npz
  python tools/pin_checkpoint.py lightglue_ckpt pinned/lightglue_S.npz
A round-trip load + max-abs-diff check runs before writing is reported ok.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEEP_KEYS = ("params", "batch_stats", "io_params", "io_batch_stats")


def main(src: str, dst: str):
    from nanovs_slam_tpu.utils.checkpoint import (load_checkpoint,
                                                  load_npz_checkpoint,
                                                  save_npz_checkpoint)

    tree, meta = load_checkpoint(src)
    pinned = {k: tree[k] for k in KEEP_KEYS if k in tree and tree[k]}
    if not pinned:
        raise SystemExit(f"no {KEEP_KEYS} in {src} (keys: {list(tree)})")

    def cast(x):
        x = np.asarray(x)
        return x.astype(np.float32) if x.dtype.kind not in "fiu" or \
            x.dtype == np.float64 else x

    import jax
    pinned = jax.tree_util.tree_map(cast, pinned)
    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    path = save_npz_checkpoint(dst, pinned, meta)

    back, back_meta = load_npz_checkpoint(path)
    flat_a = jax.tree_util.tree_leaves(pinned)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    err = max(float(np.abs(a - b).max()) if a.size else 0.0
              for a, b in zip(flat_a, flat_b))
    mb = os.path.getsize(path) / 1e6
    print(f"pinned {src} -> {path} ({mb:.2f} MB, {len(flat_a)} arrays, "
          f"roundtrip max|diff|={err:g})")
    assert err == 0.0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2])
