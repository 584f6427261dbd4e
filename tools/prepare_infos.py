#!/usr/bin/env python
"""Dataset preparation: convert raw ScanNet infos to the MVSDet format.

Equivalent of the reference `projects/NeRF-Det/prepare_infos.py:22-103`
(`update_scannet_infos_nerfdet`): rewrites per-scene records into the
{metainfo, data_list} pickle consumed by `mvsdet_tpu.data.infos`:
  cam2img, lidar2cam (per view), img_paths, axis_align_matrix,
  instances [{bbox_3d, bbox_label_3d}].

Usage:
  python tools/prepare_infos.py --input scannet_infos_train.pkl \
      --out-dir data/scannet
"""

import argparse
import os
import pickle
import sys

import numpy as np

CLASSES = (
    "cabinet", "bed", "chair", "sofa", "table", "door", "window",
    "bookshelf", "picture", "counter", "desk", "curtain", "refrigerator",
    "showercurtrain", "toilet", "sink", "bathtub", "garbagebin",
)


def convert_record(rec):
    """One raw scene record -> the new format (prepare_infos.py:51-86)."""
    out = {
        "cam2img": np.asarray(rec["intrinsics"], np.float32),
        "lidar2cam": np.asarray(rec["extrinsics"], np.float32),
        "img_paths": list(rec["img_paths"]),
    }
    anns = rec.get("annos")
    instances = []
    if anns is not None:
        out["axis_align_matrix"] = np.asarray(
            anns["axis_align_matrix"], np.float32).tolist()
        if anns.get("gt_num", 0):
            for i, name in enumerate(anns["name"]):
                label = CLASSES.index(name) if name in CLASSES else -1
                instances.append({
                    "bbox_3d": np.asarray(
                        anns["gt_boxes_upright_depth"][i],
                        np.float32).tolist(),
                    "bbox_label_3d": label,
                })
    out["instances"] = instances
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="raw scannet_infos_{split}.pkl")
    p.add_argument("--out-dir", required=True)
    args = p.parse_args()

    with open(args.input, "rb") as f:
        data = pickle.load(f)
    if isinstance(data, dict) and "data_list" in data:
        print("input already in new format; copying through")
        converted = data
    else:
        converted = {
            "metainfo": {
                "categories": {k: i for i, k in enumerate(CLASSES)},
                "dataset": "scannet",
                "info_version": "1.1",
            },
            "data_list": [convert_record(r) for r in data],
        }
    os.makedirs(args.out_dir, exist_ok=True)
    out_path = os.path.join(args.out_dir, os.path.basename(args.input))
    with open(out_path, "wb") as f:
        pickle.dump(converted, f)
    print(f"wrote {out_path}: {len(converted['data_list'])} scenes")


if __name__ == "__main__":
    main()
