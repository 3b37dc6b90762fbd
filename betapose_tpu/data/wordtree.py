"""WordTree hierarchical softmax (`tree.c` / `tree.h`, the YOLO9000
`softmax_tree` machinery) — the `tree=` option of [region] and [softmax]
(`parser.c:239-240,346-347`).

A tree file lists one node per line, `name parent_index`, parents before
children, SIBLINGS CONTIGUOUS: read_tree (tree.c:83-135) opens a new
group whenever the parent index differs from the previous line's, so a
scattered sibling set silently becomes several groups — transcribed
as-is, it is the format contract.

Semantics (all transcribed to vectorized numpy / static JAX matrices):

- forward: an independent softmax PER GROUP (blas/softmax_gpu loop,
  region_layer.c:435-442, softmax_layer.c:35-52 `softmax_tree`);
- `hierarchy_predictions` (tree.c:36-50): each node's conditional
  probability multiplied up its ancestor chain (parents first, so the
  in-place loop sees already-multiplied parents);
- `get_hierarchy_probability` (tree.c:27-34): one class's chain product;
- `hierarchy_top_prediction` (tree.c:52-81): greedy descent while the
  running chain probability clears `thresh`.  NOTE: this fork's
  read_tree never allocates `t.child` (upstream darknet fills it), so
  the C function dereferences NULL if ever called — the fork ships the
  tree machinery in a state where only the forward/loss paths can run.
  We derive `child` correctly (group index of each node's children) and
  document the divergence as a bug fix, not a behavior change: no
  in-scope code path could have executed it;
- training delta (`delta_region_class` hier branch, region_layer.c:
  116-129): for every ancestor level of the truth class, a softmax
  cross-entropy delta within that ancestor's sibling group; zero
  elsewhere.  Equivalent loss: -sum_{a in path(c)} log p_group(a)[a],
  exposed here as the static PATH/SIBLING 0/1 matrices the vectorized
  loss consumes.

The static matrices keep the TPU path gather-free: group softmax is two
matmuls against `group_onehot` [n, groups], and chain products are one
matmul against the ancestor closure in log space.
"""

from __future__ import annotations

import numpy as np


class WordTree:
    def __init__(self, parent, names):
        parent = np.asarray(parent, np.int64)
        n = len(parent)
        self.n = n
        self.parent = parent
        self.names = list(names)

        # group bookkeeping exactly as read_tree accumulates it: a new
        # group starts at each parent-index CHANGE between adjacent lines
        # (tree.c:101-110; its arrays are 1-based with a spurious leading
        # slot from the first line's change — normalized to dense 0-based
        # ids here, same partition).  Group g spans [offset, offset+size).
        group = np.zeros(n, np.int64)
        groups = 0
        last_parent = None
        for i in range(n):
            if last_parent is None or parent[i] != last_parent:
                groups += 1
                last_parent = parent[i]
            group[i] = groups - 1
        self.group = group
        self.groups = groups
        self.group_offset = np.zeros(groups, np.int64)
        self.group_size = np.zeros(groups, np.int64)
        for i in range(n):
            g = group[i]
            self.group_size[g] += 1
            if self.group_size[g] == 1:
                self.group_offset[g] = i

        self.leaf = np.ones(n, bool)
        valid = parent >= 0
        self.leaf[parent[valid]] = False

        # child[i] = group id of i's children, -1 for leaves (upstream
        # darknet semantics; this fork's read_tree leaves it NULL — see
        # module docstring)
        self.child = np.full(n, -1, np.int64)
        for g in range(groups):
            p = parent[self.group_offset[g]]
            if p >= 0:
                self.child[p] = g

    # ---- file format ----------------------------------------------------
    @classmethod
    def read(cls, path_or_text: str):
        """read_tree (tree.c:83-135): 'name parent' per line."""
        if "\n" in path_or_text or " " in path_or_text.strip():
            text = path_or_text
        else:
            text = open(path_or_text).read()
        parents, names = [], []
        for line in text.splitlines():
            line = line.strip()
            if not line:
                continue
            fields = line.split()
            names.append(fields[0])
            parents.append(int(fields[1]) if len(fields) > 1 else -1)
        return cls(parents, names)

    def change_leaves(self, leaf_names):
        """change_leaves (tree.c:7-25): mark EXACTLY the listed names as
        leaves.  Returns the found count (the C prints it)."""
        wanted = set(leaf_names)
        self.leaf = np.asarray([nm in wanted for nm in self.names])
        return int(self.leaf.sum())

    # ---- reference formulas (numpy, oracle-testable) ---------------------
    def hierarchy_probability(self, x, c: int) -> float:
        """get_hierarchy_probability (tree.c:27-34)."""
        p = 1.0
        while c >= 0:
            p *= float(x[c])
            c = int(self.parent[c])
        return p

    def hierarchy_predictions(self, predictions, only_leaves=False):
        """hierarchy_predictions (tree.c:36-50), batched on the last
        axis... predictions [..., n] conditional probs -> joint probs."""
        out = np.array(predictions, np.float32, copy=True)
        for j in range(self.n):                 # parents precede children
            p = self.parent[j]
            if p >= 0:
                out[..., j] *= out[..., p]
        if only_leaves:
            out[..., ~self.leaf] = 0.0
        return out

    def top_prediction(self, predictions, thresh: float) -> int:
        """hierarchy_top_prediction (tree.c:52-81) with the derived
        `child` array (see module docstring): greedy root-to-leaf descent
        while the chain probability clears thresh."""
        p = 1.0
        group = 0
        while True:
            o, s = int(self.group_offset[group]), int(self.group_size[group])
            seg = np.asarray(predictions[o:o + s], np.float32)
            i = int(np.argmax(seg))
            max_i = o + i
            mx = float(seg[i])
            if p * mx > thresh:
                p = p * mx
                if self.child[max_i] < 0:
                    return max_i
                group = int(self.child[max_i])
            elif group == 0:
                return max_i
            else:
                return int(self.parent[self.group_offset[group]])

    # ---- static matrices for the JAX paths -------------------------------
    def group_onehot(self):
        """[n, groups] 0/1: column g selects group g's nodes.  Group
        softmax = exp(z) / (exp(z) @ G) @ G.T, all matmuls."""
        m = np.zeros((self.n, self.groups), np.float32)
        m[np.arange(self.n), self.group] = 1.0
        return m

    def ancestor_matrix(self, include_self=True):
        """[n, n] 0/1: row c marks c's ancestor chain.  Chain products =
        exp(A @ log p)."""
        m = np.zeros((self.n, self.n), np.float32)
        for c in range(self.n):
            j = c if include_self else int(self.parent[c])
            while j >= 0:
                m[c, j] = 1.0
                j = int(self.parent[j])
        return m

    def sibling_matrix(self):
        """[n, n] 0/1: row c marks every node in any of c's ancestor-
        chain groups (the support of delta_region_class's hier delta)."""
        a = self.ancestor_matrix()
        grp = self.group_onehot()
        return np.minimum(a @ grp @ grp.T, 1.0).astype(np.float32)


def group_softmax(z, group_onehot):
    """Per-group softmax over the last axis via matmuls (gather-free).
    z [..., n]; group_onehot [n, groups] (f32 numpy or jax)."""
    import jax.numpy as jnp
    g = jnp.asarray(group_onehot, jnp.float32)
    z = z.astype(jnp.float32)
    # per-group max for stability: mask non-members to -inf, reduce
    zmax = jnp.max(jnp.where(g.T > 0, z[..., None, :], -jnp.inf),
                   axis=-1)                        # [..., groups]
    zc = z - zmax @ g.T                            # stabilized per group
    e = jnp.exp(zc)
    denom = e @ g                                  # [..., groups]
    return e / (denom @ g.T)


def group_log_softmax(z, group_onehot):
    """log of group_softmax, same matmul structure (for the hier CE)."""
    import jax.numpy as jnp
    g = jnp.asarray(group_onehot, jnp.float32)
    z = z.astype(jnp.float32)
    zmax = jnp.max(jnp.where(g.T > 0, z[..., None, :], -jnp.inf),
                   axis=-1)
    zc = z - zmax @ g.T
    denom = jnp.exp(zc) @ g
    return zc - jnp.log(denom) @ g.T
