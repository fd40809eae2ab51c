#!/usr/bin/env python
"""Set a key in datasets.json (reference utils/set_json.py:6-27 CLI)."""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("key", help="e.g. coco_data_path, hpatches_data_path")
    p.add_argument("value")
    p.add_argument("--file", default="datasets.json")
    args = p.parse_args()
    data = {}
    if os.path.exists(args.file):
        with open(args.file) as f:
            data = json.load(f)
    data[args.key] = args.value
    with open(args.file, "w") as f:
        json.dump(data, f, indent=2)
    print(f"{args.file}: {args.key} = {args.value}")


if __name__ == "__main__":
    main()
