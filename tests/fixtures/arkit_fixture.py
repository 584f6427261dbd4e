"""Miniature real-format ARKitScenes (CN-RMA layout) dataset.

ARKit analogue of `scannet_fixture.py`: a generator writes, into a temp
directory, the RAW CN-RMA-style pkl that `tools/prepare_infos.py
--dataset arkit` consumes (per-view (N, 3, 3) ``intrinsics``, (N, 4, 4)
``extrinsics``, ``img_paths``/``depth_paths``, ``annos`` with 7-dim
yaw boxes — ref: nerfdet/scannet_multiview_dataset.py:206-366) plus
posed JPEG frames at the ARKit low-res aspect (192x256).
"""

import os
import pickle

import numpy as np

# ARKit low-res capture resolution and a plausible intrinsic
ORI_H, ORI_W = 192, 256
FX = FY = 212.0
CX, CY = 127.5, 95.5

ARKIT_CLASSES = (
    "cabinet", "refrigerator", "shelf", "stove", "bed",
    "sink", "washer", "toilet", "bathtub", "oven",
    "dishwasher", "fireplace", "stool", "chair", "table",
    "tv_monitor", "sofa",
)


def _look_at_w2c(eye, target, up=(0.0, 0.0, 1.0)):
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1] = right, down
    c2w[:3, 2], c2w[:3, 3] = fwd, eye
    return np.linalg.inv(c2w)


def make_raw_arkit_fixture(root, n_scenes=2, n_frames=10,
                           img_hw=(48, 64), seed=0):
    """Write the raw CN-RMA pkl + frames under `root`; return pkl path."""
    import cv2

    rng = np.random.RandomState(seed)
    records = []
    for s in range(n_scenes):
        scene = f"arkit{s:04d}"
        img_dir = os.path.join(root, "frames", scene)
        os.makedirs(img_dir, exist_ok=True)

        intrinsics, extrinsics, img_paths, depth_paths = [], [], [], []
        for f in range(n_frames):
            ang = 2 * np.pi * f / n_frames
            eye = np.array([2.0 * np.cos(ang), 2.0 * np.sin(ang),
                            1.3 + 0.1 * np.sin(3 * ang)])
            # extrinsics stored such that c2w = identity @ extrinsic
            # (no axis-align for ARKit, prepare_infos.convert_record_arkit)
            extrinsics.append(np.linalg.inv(_look_at_w2c(eye, [0, 0, 0.8])))
            # per-view K with small per-frame jitter (ARKit recalibrates)
            k = np.array([[FX + 0.2 * f, 0, CX],
                          [0, FY + 0.2 * f, CY],
                          [0, 0, 1.0]], np.float64)
            intrinsics.append(k)

            h, w = img_hw
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([
                (127 + 110 * np.sin(xx / 7.0 + f)).astype(np.uint8),
                (127 + 110 * np.cos(yy / 5.0 + s)).astype(np.uint8),
                ((2 * xx + yy + 11 * f) % 255).astype(np.uint8),
            ], -1)
            rel = os.path.join("frames", scene, f"{f:04d}.jpg")
            cv2.imwrite(os.path.join(root, rel), img[..., ::-1])
            img_paths.append(rel)
            depth_paths.append(rel[:-4] + ".png")

        n_box = 3
        centres = rng.uniform(-1.2, 1.2, (n_box, 3)) * [1, 1, 0.4] + \
            [0, 0, 0.8]
        dims = rng.uniform(0.3, 1.0, (n_box, 3))
        yaws = rng.uniform(-np.pi, np.pi, (n_box, 1))
        boxes = np.concatenate([centres, dims, yaws], -1)
        names = [ARKIT_CLASSES[i]
                 for i in rng.randint(0, len(ARKIT_CLASSES), n_box)]
        # one out-of-vocab instance exercises the -1 drop path
        boxes = np.concatenate(
            [boxes, [[0.0, 0.0, 0.5, 0.4, 0.4, 0.4, 0.3]]], 0)
        names = names + ["plant"]

        records.append({
            "intrinsics": np.stack(intrinsics),          # (N, 3, 3)
            "extrinsics": np.stack(extrinsics),          # (N, 4, 4)
            "img_paths": img_paths,
            "depth_paths": depth_paths,
            "original_hw": (ORI_H, ORI_W),
            "annos": {
                "gt_num": len(names),
                "name": np.asarray(names),
                "gt_boxes_upright_depth": boxes.astype(np.float32),
            },
        })

    pkl_path = os.path.join(root, "arkit_infos_train.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump(records, f)
    return pkl_path
