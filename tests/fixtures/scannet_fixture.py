"""Miniature real-format ScanNet dataset, generated deterministically.

Plays the role of the reference's `tests/data/scannet/` fixture
(real `scannet_infos.pkl` + data files, SURVEY §4) without committing
binaries: a generator writes, into a temp directory,

  * `scannet_infos_train.pkl` in the RAW format `prepare_infos.py`
    consumes (list of records with `intrinsics`, `extrinsics` (N,4,4),
    `img_paths`, `annos{axis_align_matrix, gt_num, name,
    gt_boxes_upright_depth}` — ref prepare_infos.py:50-86);
  * posed JPEG frames on disk at the ScanNet aspect ratio.

Geometry is a realistic indoor capture: cameras orbiting a room,
ScanNet colour intrinsics (fx=fy=1170.19, cx=647.75, cy=483.75 at
968x1296), a non-identity axis-align rotation, and labelled
axis-aligned boxes.
"""

import os
import pickle

import numpy as np

# ScanNet colour-camera intrinsics at the posed-RGB resolution 968x1296
FX = FY = 1170.187988
CX, CY = 647.75, 483.75
ORI_H, ORI_W = 968, 1296

CLASSES = (
    "cabinet", "bed", "chair", "sofa", "table", "door", "window",
    "bookshelf", "picture", "counter", "desk", "curtain", "refrigerator",
    "showercurtrain", "toilet", "sink", "bathtub", "garbagebin",
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


def make_raw_fixture(root, n_scenes=2, n_frames=12, img_hw=(121, 162),
                     seed=0):
    """Write the raw pkl + frames under `root`; return the pkl path.

    Frames are stored at `img_hw` (1/8 scale, same aspect) to keep the
    fixture tiny — intrinsics stay calibrated for 968x1296 exactly as in
    the real dataset, because the pipeline rescales from
    `SceneInfo.original_hw`, never from the stored file size.
    """
    import cv2

    rng = np.random.RandomState(seed)
    k = np.eye(4, dtype=np.float64)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = FX, FY, CX, CY

    records = []
    for s in range(n_scenes):
        scene = f"scene{s:04d}_00"
        img_dir = os.path.join(root, "posed_images", scene)
        os.makedirs(img_dir, exist_ok=True)

        # axis-align: yaw + translation, as real ScanNet scenes have
        yaw = rng.uniform(-0.6, 0.6)
        aa = np.eye(4)
        aa[:2, :2] = [[np.cos(yaw), -np.sin(yaw)],
                      [np.sin(yaw), np.cos(yaw)]]
        aa[:3, 3] = rng.uniform(-2, 2, 3) * [1, 1, 0.2]
        aa_inv = np.linalg.inv(aa)

        centre_aligned = np.array([0.0, 0.0, 1.0])
        extrinsics, img_paths = [], []
        for f in range(n_frames):
            ang = 2 * np.pi * f / n_frames
            eye_aligned = np.array([2.2 * np.cos(ang), 2.2 * np.sin(ang),
                                    1.4 + 0.2 * np.sin(2 * ang)])
            # poses in the pkl are pre-alignment (lidar2cam is composed
            # with axis_align by the dataset: w2c = inv(aa @ l2c))
            w2c_aligned = _look_at_w2c(eye_aligned, centre_aligned)
            lidar2cam = aa_inv @ np.linalg.inv(w2c_aligned)
            # reference stores 'extrinsics' such that
            # c2w = axis_align @ lidar2cam (infos.py docstring)
            extrinsics.append(lidar2cam)

            h, w = img_hw
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([
                (127 + 120 * np.sin(xx / 9.0 + f)).astype(np.uint8),
                (127 + 120 * np.cos(yy / 7.0 + s)).astype(np.uint8),
                ((xx + yy + 13 * f) % 255).astype(np.uint8),
            ], -1)
            rel = os.path.join("posed_images", scene, f"{f:05d}.jpg")
            cv2.imwrite(os.path.join(root, rel), img[..., ::-1])
            img_paths.append(rel)

        n_box = 3 + s
        centres = rng.uniform(-1.5, 1.5, (n_box, 3)) * [1, 1, 0.4] + \
            [0, 0, 0.9]
        dims = rng.uniform(0.3, 1.2, (n_box, 3))
        names = [CLASSES[i] for i in
                 rng.randint(0, len(CLASSES), n_box)]
        # one out-of-vocabulary instance to exercise the -1 path
        boxes = np.concatenate([centres, dims], -1)
        boxes = np.concatenate(
            [boxes, [[0.0, 0.0, 0.5, 0.4, 0.4, 0.4]]], 0)
        names = names + ["otherfurniture"]

        records.append({
            # ScanNet saves ONE intrinsic per scene
            # (scannet_multiview_dataset.py:156 "every scene save an
            # intrinsic"); ARKit saves per-view (N,4,4)
            "intrinsics": k,
            "extrinsics": extrinsics,
            "img_paths": img_paths,
            "annos": {
                "axis_align_matrix": aa,
                "gt_num": len(names),
                "name": np.asarray(names),
                "gt_boxes_upright_depth": boxes.astype(np.float32),
            },
        })

    pkl_path = os.path.join(root, "scannet_infos_train.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump(records, f)
    return pkl_path
