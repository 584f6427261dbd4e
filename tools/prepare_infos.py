#!/usr/bin/env python
"""Dataset preparation: convert raw ScanNet/ARKit infos to MVSDet format.

Equivalent of the reference `projects/NeRF-Det/prepare_infos.py:22-103`
(`update_scannet_infos_nerfdet`): rewrites per-scene records into the
{metainfo, data_list} pickle consumed by `mvsdet_tpu.data.infos`:
  cam2img, lidar2cam (per view), img_paths, axis_align_matrix,
  instances [{bbox_3d, bbox_label_3d}].

With --dataset arkit, converts CN-RMA-layout ARKitScenes infos (the
reference's ARKit path: README.md:25 points at CN-RMA for data prep;
the resulting `arkit_infos_*_new_ReverseYaw.pkl` is consumed by
MultiViewARKitDataset, scannet_multiview_dataset.py:207-374): per-view
3x3 intrinsics, explicit depth_paths, 7-dim yaw boxes, identity
axis-align.  --reverse-yaw negates box yaw (the reference's pkl is the
"ReverseYaw" variant: CN-RMA stores yaw with the opposite sign
convention from DepthInstance3DBoxes).

Usage:
  python tools/prepare_infos.py --input scannet_infos_train.pkl \
      --out-dir data/scannet
  python tools/prepare_infos.py --dataset arkit --reverse-yaw \
      --input arkit_infos_train.pkl --out-dir data/arkit
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

# MultiViewARKitDataset.METAINFO (scannet_multiview_dataset.py:208-214)
ARKIT_CLASSES = (
    "cabinet", "refrigerator", "shelf", "stove", "bed",
    "sink", "washer", "toilet", "bathtub", "oven",
    "dishwasher", "fireplace", "stool", "chair", "table",
    "tv_monitor", "sofa",
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


def convert_record_arkit(rec, classes=ARKIT_CLASSES, reverse_yaw=False):
    """One CN-RMA ARKit record -> the new format.

    Input record layout (CN-RMA arkit infos): per-view ``intrinsics``
    (N, 3, 3), ``extrinsics`` (N, 4, 4) cam-from-world, ``img_paths``,
    ``depth_paths``, ``annos`` with 7-dim ``gt_boxes_upright_depth``
    (x, y, z, dx, dy, dz, yaw) and ``name`` per box.  No axis-align
    matrix (identity, scannet_multiview_dataset.py:256-262).
    """
    out = {
        "cam2img": np.asarray(rec["intrinsics"], np.float32),    # (N, 3, 3)
        "lidar2cam": np.asarray(rec["extrinsics"], np.float32),  # (N, 4, 4)
        "img_paths": list(rec["img_paths"]),
        "depth_paths": list(rec.get("depth_paths",
                                    [p[:-4] + ".png"
                                     for p in rec["img_paths"]])),
        "original_hw": tuple(rec.get("original_hw", (192, 256))),
    }
    instances = []
    anns = rec.get("annos")
    if anns is not None and anns.get("gt_num", 0):
        for i, name in enumerate(anns["name"]):
            label = classes.index(name) if name in classes else -1
            box = np.asarray(anns["gt_boxes_upright_depth"][i],
                             np.float32).copy()
            if reverse_yaw and box.shape[0] >= 7:
                box[6] = -box[6]
            instances.append({"bbox_3d": box.tolist(),
                              "bbox_label_3d": label})
    out["instances"] = instances
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="raw scannet_infos_{split}.pkl")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--dataset", default="scannet",
                   choices=["scannet", "arkit"])
    p.add_argument("--reverse-yaw", action="store_true",
                   help="negate box yaw (ARKit ReverseYaw convention)")
    args = p.parse_args()

    with open(args.input, "rb") as f:
        data = pickle.load(f)
    if isinstance(data, dict) and "data_list" in data:
        print("input already in new format; copying through")
        converted = data
    else:
        if args.dataset == "arkit":
            classes = ARKIT_CLASSES
            records = [convert_record_arkit(r, classes, args.reverse_yaw)
                       for r in data]
        else:
            classes = CLASSES
            records = [convert_record(r) for r in data]
        converted = {
            "metainfo": {
                "categories": {k: i for i, k in enumerate(classes)},
                "dataset": args.dataset,
                "info_version": "1.1",
            },
            "data_list": records,
        }
    os.makedirs(args.out_dir, exist_ok=True)
    out_path = os.path.join(args.out_dir, os.path.basename(args.input))
    with open(out_path, "wb") as f:
        pickle.dump(converted, f)
    print(f"wrote {out_path}: {len(converted['data_list'])} scenes")


if __name__ == "__main__":
    main()
