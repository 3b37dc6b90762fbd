"""Shared synthetic SIXD/LineMod dataset builder for integration tests."""

import numpy as np
import yaml

from betapose_tpu.data import ply as plyio


def make_synthetic_sixd(base_dir, n_frames=3, obj_id=1, seed=0,
                        img_shape=(480, 640)):
    """Build a minimal SIXD tree: one cube object, GT poses, yml metadata,
    rgb pngs.  Returns the base path (str)."""
    import cv2
    base = base_dir / "sixd"
    (base / "models").mkdir(parents=True, exist_ok=True)
    (base / "kpmodels").mkdir(exist_ok=True)
    seq = base / "test" / ("%02d" % obj_id)
    (seq / "rgb").mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(seed)
    s = 40.0  # 8cm cube, mm units
    corners = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                        for z in (-s, s)])
    surface = rng.uniform(-s, s, (400, 3))
    ax = rng.integers(0, 3, 400)
    sign = rng.choice([-1.0, 1.0], 400)
    surface[np.arange(400), ax] = sign * s
    verts = np.concatenate([corners, surface])
    plyio.write_vertices_ascii(base / "models" / f"obj_{obj_id:02d}.ply",
                               verts)
    kp = verts[rng.choice(len(verts), 60, replace=False)]
    plyio.write_vertices_ascii(base / "kpmodels" / f"obj_{obj_id:02d}.ply",
                               kp)
    with open(base / "models" / "models_info.yml", "w") as f:
        yaml.safe_dump({obj_id: {"diameter": float(2 * s * np.sqrt(3))}}, f)

    h, w = img_shape
    gts, infos = {}, {}
    for i in range(n_frames):
        ang = 0.3 * i
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0],
                      [0, 0, 1]])
        t = np.array([20.0 * i - 10.0, 5.0 * i, 600.0 + 30 * i])
        gts[i] = [{
            "cam_R_m2c": [float(v) for v in R.reshape(-1)],
            "cam_t_m2c": [[float(v)] for v in t],
            "obj_bb": [200, 150, 180, 170],
            "obj_id": obj_id,
        }]
        infos[i] = {"cam_K": [572.4114, 0.0, 325.2611, 0.0, 573.57043,
                              242.04899, 0.0, 0.0, 1.0]}
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(seq / "rgb" / f"{i:04d}.png"), img)
    with open(seq / "gt.yml", "w") as f:
        yaml.safe_dump(gts, f)
    with open(seq / "info.yml", "w") as f:
        yaml.safe_dump(infos, f)
    return str(base)
