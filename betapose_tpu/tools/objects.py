"""Synthetic object zoo for the multi-object accuracy sweep.

The reference's accuracy domain is 13 *varied* real meshes — including
rotationally-symmetric (eggbox, glue) and non-convex ones — evaluated one
sequence per object with per-object weights (`betapose_evaluate.py:80`,
`KPD/src/main_fast_inference.py:29-36`).  The selftest's single cube
cannot falsify cube-specific tuning, so the sweep grades three *distinct*
geometries:

- ``cube``:   the original selftest object (rich per-face colors);
- ``prism``:  a rectangular box whose paired faces share flat colors —
  its appearance is EXACTLY invariant under a 180° rotation about z
  (the renderer shades by face normal only, so ±x / ±y same-color face
  pairs swap into each other pixel-for-pixel).  The synthetic analog of
  LineMod's symmetric objects: plain ADD is the wrong success metric for
  it, ADD-S the right one (`utils/metrics.py:23-33`).
- ``lwedge``: an L-shaped union of two boxes — non-convex silhouette,
  self-occluding parts, concave bbox interior.

Symmetric-object annotation uses pose canonicalization: views that look
identical MUST get identical keypoint labels, or heatmap training
averages the symmetry modes into garbage.  ``canonicalize_pose`` picks a
deterministic representative of the symmetry orbit (standard practice for
keypoint training on symmetric objects); the EVAL still compares against
the raw GT pose, which is exactly why the symmetric object fails plain
ADD and passes ADD-S end-to-end.
"""

from __future__ import annotations

import numpy as np

# face order: x-, x+, y-, y+, z-, z+  (corner index = 4*(x>0)+2*(y>0)+(z>0))
_QUADS = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
          (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]


def _box_mesh(center, half, face_colors):
    """Axis-aligned box triangle mesh with per-face flat colors.

    Returns (verts [24,3], colors [24,3], tris [12,3]) — same quad
    corner/winding layout as the selftest CubeModel."""
    center = np.asarray(center, float)
    half = np.asarray(half, float)
    c = center + np.array([[x, y, z] for x in (-half[0], half[0])
                           for y in (-half[1], half[1])
                           for z in (-half[2], half[2])])
    face_colors = np.asarray(face_colors, float)
    verts, cols, tris = [], [], []
    for qi, q in enumerate(_QUADS):
        base = len(verts)
        for vi in q:
            verts.append(c[vi])
        col = face_colors[qi]
        cols.extend([col] * 4)
        tris.append([base, base + 1, base + 2])
        tris.append([base, base + 2, base + 3])
    return np.asarray(verts), np.asarray(cols), np.asarray(tris, int)


class MeshObject:
    """Renderable object (.vertices/.colors/.faces for geometry.Renderer)
    with designated keypoints, symmetry group, and metric metadata."""

    def __init__(self, name, boxes, n_kp=26, symmetries=()):
        """boxes: list of (center, half, face_colors[6])."""
        self.name = name
        self.boxes = [(np.asarray(c, float), np.asarray(h, float))
                      for c, h, _ in boxes]
        vs, cs, ts = [], [], []
        off = 0
        for c, h, fc in boxes:
            v, col, t = _box_mesh(c, h, fc)
            vs.append(v)
            cs.append(col)
            ts.append(t + off)
            off += len(v)
        self.vertices = np.concatenate(vs)
        self.colors = np.concatenate(cs)
        self.faces = np.concatenate(ts)
        # symmetry group generators as 3x3 object-frame rotations
        # (identity excluded); () = asymmetric
        self.symmetries = tuple(np.asarray(S, float) for S in symmetries)
        self.keypoints = designate_keypoints(self, n_kp)
        # channel permutations induced by each symmetry element (orbit-
        # closed designation guarantees they exist) — consumed by the
        # symmetry-aware KPD training loss
        self.symmetry_perms = (symmetry_keypoint_perms(
            self.keypoints, self.symmetries) if self.symmetries else ())
        d = self.vertices
        self.diameter = float(np.sqrt(
            ((d[None] - d[:, None]) ** 2).sum(-1)).max())

    def contains_interior(self, p, eps=1e-9):
        """True if p lies strictly inside any constituent box."""
        for c, h in self.boxes:
            if np.all(np.abs(p - c) < h - eps):
                return True
        return False


def _box_candidates(center, half):
    """Corner / face-center / edge-midpoint candidate keypoints of one box
    (the same well-spread designation scheme the cube selftest uses — what
    a 3D-SIFT designator produces on a faceted solid)."""
    center = np.asarray(center, float)
    hx, hy, hz = np.asarray(half, float)
    corners = center + np.array([[x, y, z] for x in (-hx, hx)
                                 for y in (-hy, hy) for z in (-hz, hz)])
    centers = center + np.array([[-hx, 0, 0], [hx, 0, 0], [0, -hy, 0],
                                 [0, hy, 0], [0, 0, -hz], [0, 0, hz]])
    edge_mids = []
    for i in range(8):
        for j in range(i + 1, 8):
            if np.sum(np.abs(corners[i] - corners[j]) > 1e-9) == 1:
                edge_mids.append((corners[i] + corners[j]) / 2)
    return np.concatenate([corners, centers, np.asarray(edge_mids)])


def designate_keypoints(obj: MeshObject, n_kp: int) -> np.ndarray:
    """Designate n_kp well-spread surface keypoints: pool the per-box
    corner/center/edge-mid candidates, drop points swallowed inside the
    union (a box-A face center can sit inside box B), then greedy
    farthest-point selection for spread (the min-distance spirit of
    `Model3D.refine`, `utils/model.py:29-48`, run forward instead of
    backward).

    For symmetric objects the selection is ORBIT-closed: candidates are
    grouped into orbits under the symmetry group and whole orbits are
    selected, so the designated set maps onto itself under every symmetry
    element.  That closure is what makes the symmetry's action on
    keypoints a channel PERMUTATION (`symmetry_keypoint_perms`) — the
    property the symmetry-aware training loss needs."""
    cands = np.concatenate([_box_candidates(c, h) for c, h in obj.boxes])
    keep = np.array([not obj.contains_interior(p) for p in cands])
    cands = cands[keep]
    # dedupe (shared edges/corners between boxes)
    _, uniq = np.unique(np.round(cands, 9), axis=0, return_index=True)
    cands = cands[np.sort(uniq)]
    if len(cands) <= n_kp:
        return cands
    if obj.symmetries:
        return _designate_orbit_closed(cands, obj.symmetries, n_kp)
    # farthest-point: seed with the point farthest from the centroid
    sel = [int(np.argmax(((cands - cands.mean(0)) ** 2).sum(1)))]
    d2 = ((cands - cands[sel[0]]) ** 2).sum(1)
    for _ in range(n_kp - 1):
        nxt = int(np.argmax(d2))
        sel.append(nxt)
        d2 = np.minimum(d2, ((cands - cands[nxt]) ** 2).sum(1))
    return cands[np.asarray(sel)]


def _symmetry_group(symmetries, tol=1e-9):
    """Close the generator set into the full (finite) symmetry group,
    identity included."""
    group = [np.eye(3)]
    frontier = [np.asarray(S, float) for S in symmetries]
    while frontier:
        S = frontier.pop()
        if any(np.allclose(S, G, atol=tol) for G in group):
            continue
        group.append(S)
        for G in list(group):
            frontier.append(S @ G)
            frontier.append(G @ S)
        if len(group) > 64:
            raise ValueError("symmetry group closure exceeded 64 elements")
    return group


def _candidate_orbits(cands, symmetries, tol=1e-6):
    """Partition candidate indices into orbits under the symmetry group.
    Every group image of a candidate must land on a candidate (the pooled
    corner/center/edge-mid set of a symmetric solid is closed by
    construction)."""
    group = _symmetry_group(symmetries)
    assigned = np.full(len(cands), -1, int)
    orbits = []
    for i in range(len(cands)):
        if assigned[i] >= 0:
            continue
        orb = set()
        for G in group:
            p = G @ cands[i]
            d2 = ((cands - p) ** 2).sum(1)
            j = int(np.argmin(d2))
            if d2[j] > tol * tol:
                raise ValueError(
                    "candidate set is not closed under the symmetry group")
            orb.add(j)
        oid = len(orbits)
        for j in orb:
            assigned[j] = oid
        orbits.append(sorted(orb))
    return orbits


def _designate_orbit_closed(cands, symmetries, n_kp):
    """Greedy farthest-point over symmetry ORBITS: each step adds the
    whole orbit whose best member is farthest from the selected set,
    skipping orbits that would make the remaining budget unfillable
    (subset-sum feasibility over the remaining orbit sizes)."""
    orbits = _candidate_orbits(cands, symmetries)

    def fillable(budget, sizes):
        ok = np.zeros(budget + 1, bool)
        ok[0] = True
        for s in sizes:
            if s <= budget:
                ok[s:] |= ok[:-s].copy()
        return bool(ok[budget])

    if not fillable(n_kp, [len(o) for o in orbits]):
        raise ValueError(
            f"n_kp={n_kp} cannot be met with symmetry-closed orbits "
            f"(orbit sizes: {sorted(len(o) for o in orbits)})")
    remaining = list(range(len(orbits)))
    sel = []
    d2 = ((cands - cands.mean(0)) ** 2).sum(1)   # seed score: centroid dist
    while len(sel) < n_kp and remaining:
        budget = n_kp - len(sel)
        best_oi, best_score = None, -1.0
        for oi in remaining:
            orb = orbits[oi]
            if len(orb) > budget:
                continue
            rest = [len(orbits[oj]) for oj in remaining
                    if oj != oi]
            if not fillable(budget - len(orb), rest):
                continue
            score = float(d2[orb].max())
            if score > best_score:
                best_oi, best_score = oi, score
        if best_oi is None:
            break
        remaining.remove(best_oi)
        for j in orbits[best_oi]:
            sel.append(j)
            d2 = np.minimum(d2, ((cands - cands[j]) ** 2).sum(1))
    assert len(sel) == n_kp
    return cands[np.asarray(sel)]


def symmetry_keypoint_perms(keypoints, symmetries, tol=1e-6):
    """Per symmetry element S, the permutation pi with
    S @ keypoints[i] == keypoints[pi[i]].

    This is the bridge between pose symmetry and heatmap channels: the
    keypoint label set for pose R.S equals the label set for pose R with
    channels permuted by pi (visibility included — keypoint i under R.S
    projects exactly where keypoint pi[i] does under R).  The KPD
    symmetry-aware loss (`kpd_train.make_loss_fn(sym_perms=...)`) uses it
    to score a prediction against every mode and train on the best one."""
    keypoints = np.asarray(keypoints, float)
    perms = []
    for S in symmetries:
        mapped = keypoints @ np.asarray(S, float).T
        d2 = ((mapped[:, None] - keypoints[None]) ** 2).sum(-1)
        perm = np.argmin(d2, axis=1)
        worst = float(np.sqrt(d2[np.arange(len(perm)), perm]).max())
        if worst > tol or len(set(perm.tolist())) != len(perm):
            raise ValueError(
                f"keypoint set is not closed under symmetry "
                f"(worst match {worst:.2e})")
        perms.append(perm.astype(np.int32))
    return tuple(perms)


def canonicalize_pose(pose: np.ndarray, symmetries) -> np.ndarray:
    """Deterministic representative of the pose's symmetry orbit.

    Among {R} ∪ {R·S : S in symmetries}, pick the rotation whose
    row-major flattening is lexicographically largest (measure-zero tie
    set).  Identical-looking views of a symmetric object therefore get
    identical keypoint annotations — the supervision stays consistent and
    the trained net predicts THIS representative, which differs from the
    raw GT by a symmetry element on ~half the frames (2-fold case): the
    e2e demonstration that plain ADD rejects and ADD-S accepts."""
    pose = np.asarray(pose)
    if not symmetries:
        return pose
    R = pose[:3, :3]
    best_R, best_key = R, tuple(np.round(R.reshape(-1), 9))
    for S in symmetries:
        Rc = R @ np.asarray(S)
        key = tuple(np.round(Rc.reshape(-1), 9))
        if key > best_key:
            best_R, best_key = Rc, key
    out = pose.copy()
    out[:3, :3] = best_R
    return out


# bright, saturated, mutually distinct palettes (background noise is dim)
def cube_object(n_kp: int = 26) -> MeshObject:
    colors = np.array([
        [0.9, 0.2, 0.2], [0.2, 0.9, 0.2], [0.2, 0.3, 0.9],
        [0.9, 0.9, 0.2], [0.9, 0.3, 0.9], [0.2, 0.9, 0.9]])
    return MeshObject("cube", [((0, 0, 0), (0.04, 0.04, 0.04), colors)],
                      n_kp=n_kp)


def prism_object(n_kp: int = 26) -> MeshObject:
    """180°-about-z symmetric rectangular prism: ±x faces share red, ±y
    faces share green; distinct flat caps (blue / yellow) kill any OTHER
    symmetry (no 4-fold — cross-section is rectangular, hx != hy — and no
    cap swap)."""
    red, green = [0.95, 0.25, 0.2], [0.2, 0.9, 0.3]
    blue, yellow = [0.25, 0.35, 0.95], [0.95, 0.9, 0.2]
    colors = np.array([red, red, green, green, blue, yellow])
    return MeshObject(
        "prism", [((0, 0, 0), (0.025, 0.04, 0.05), colors)], n_kp=n_kp,
        symmetries=(np.diag([-1.0, -1.0, 1.0]),))


def lwedge_object(n_kp: int = 26) -> MeshObject:
    """Non-convex L: a tall bar plus a foot jutting out in +y at the
    bottom — concave silhouette, parts that self-occlude, a bbox whose
    interior is mostly empty."""
    bar_colors = np.array([
        [0.95, 0.3, 0.2], [0.2, 0.85, 0.35], [0.25, 0.4, 0.95],
        [0.95, 0.85, 0.2], [0.9, 0.3, 0.9], [0.2, 0.9, 0.9]])
    foot_colors = np.array([
        [0.95, 0.55, 0.15], [0.55, 0.25, 0.9], [0.35, 0.95, 0.65],
        [0.95, 0.4, 0.55], [0.6, 0.8, 0.2], [0.9, 0.7, 0.5]])
    return MeshObject(
        "lwedge",
        [((0, 0, 0), (0.02, 0.02, 0.05), bar_colors),
         ((0, 0.04, -0.03), (0.02, 0.035, 0.02), foot_colors)],
        n_kp=n_kp)


OBJECT_BUILDERS = {
    "cube": cube_object,
    "prism": prism_object,
    "lwedge": lwedge_object,
}
