#!/usr/bin/env python
"""Pseudo ground-truth generation for COCO training.

CLI contract mirrors the reference create_depth.py (MiDaS DPT depth ->
uint16 PNGs) and create_segmentation.py (SegFormer-b0-cityscapes masks),
using HuggingFace transformers. Models must be available locally
(--model_dir) since this environment has no network egress; the script
degrades to an explanatory message otherwise.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["depth", "segmentation"],
                   required=True)
    p.add_argument("--images", required=True, help="input image dir")
    p.add_argument("--out", required=True, help="output PNG dir")
    p.add_argument("--model_dir", default=None,
                   help="local HF model dir (e.g. Intel/dpt-hybrid-midas "
                        "or nvidia/segformer-b0-finetuned-cityscapes)")
    p.add_argument("--max_images", type=int, default=None)
    return p.parse_args()


def main():
    import cv2

    args = parse_args()
    files = sorted(glob.glob(os.path.join(args.images, "*")))
    if args.max_images:
        files = files[: args.max_images]
    os.makedirs(args.out, exist_ok=True)

    try:
        import torch
        from transformers import (AutoImageProcessor,
                                  AutoModelForDepthEstimation,
                                  AutoModelForSemanticSegmentation)

        name = args.model_dir or (
            "Intel/dpt-hybrid-midas" if args.task == "depth"
            else "nvidia/segformer-b0-finetuned-cityscapes-1024-1024")
        processor = AutoImageProcessor.from_pretrained(name)
        if args.task == "depth":
            net = AutoModelForDepthEstimation.from_pretrained(name)
        else:
            net = AutoModelForSemanticSegmentation.from_pretrained(name)
        net.eval()
    except Exception as e:
        print(f"pseudo-GT model unavailable ({e}).\n"
              "Provide --model_dir pointing at a locally downloaded "
              "DPT/SegFormer model.")
        return 1

    for f in files:
        img = cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB)
        inputs = processor(images=img, return_tensors="pt")
        with torch.no_grad():
            out = net(**inputs)
        stem = os.path.splitext(os.path.basename(f))[0]
        dst = os.path.join(args.out, stem + ".png")
        if args.task == "depth":
            d = out.predicted_depth[0].numpy()
            d = cv2.resize(d, (img.shape[1], img.shape[0]))
            d16 = np.clip(d / max(d.max(), 1e-6) * 65000, 0,
                          65535).astype(np.uint16)
            cv2.imwrite(dst, d16)
        else:
            logits = out.logits[0].numpy()
            seg = logits.argmax(0).astype(np.uint8)
            seg = cv2.resize(seg, (img.shape[1], img.shape[0]),
                             interpolation=cv2.INTER_NEAREST)
            cv2.imwrite(dst, seg)
        print(dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
