"""Packed STR (Sort-Tile-Recursive) R-tree over bounding boxes, pure numpy.

Stands in for the JVM-global STRtree "memory index" the reference enables via
``GeoSPARQLConfig.setupMemoryIndex()``
(/root/reference/src/main/de/hsmainz/cs/semgis/arqextension/PostGISConfig.java:812).
Built once per actor in `__init__` (stateful stage), then probed per batch.

Queries are *batch*-vectorized: `query_points` / `query_boxes` take whole
numpy arrays of probes and return a (probe_idx, item_idx) candidate-pair
COO listing, computed by frontier expansion over tree levels with numpy
masks — no per-probe Python recursion.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    def __init__(self, boxes: np.ndarray, leaf_size: int = 16):
        """boxes: (n, 4) float64 [xmin, ymin, xmax, ymax]."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.leaf_size = leaf_size
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        # STR packing: sort by center-x, slice into vertical strips, sort
        # each strip by center-y
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        nleaf = int(np.ceil(self.n / leaf_size))
        nstrip = max(1, int(np.ceil(np.sqrt(nleaf))))
        per_strip = int(np.ceil(self.n / nstrip))
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(self.n, dtype=np.int64)
        for s in range(nstrip):
            sl = by_x[s * per_strip:(s + 1) * per_strip]
            order[s * per_strip:s * per_strip + len(sl)] = sl[np.argsort(cy[sl], kind="stable")]
        self.order = order
        leaf_boxes = boxes[order]

        # build levels bottom-up; each level is an (m, 4) bbox array where
        # node k covers children [k*leaf_size, (k+1)*leaf_size)
        self.levels = [leaf_boxes]
        cur = leaf_boxes
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / leaf_size))
            pad = m * leaf_size - len(cur)
            if pad:
                filler = np.repeat([[np.inf, np.inf, -np.inf, -np.inf]], pad, axis=0)
                cur = np.vstack([cur, filler])
            grp = cur.reshape(m, leaf_size, 4)
            parents = np.column_stack([
                grp[:, :, 0].min(axis=1), grp[:, :, 1].min(axis=1),
                grp[:, :, 2].max(axis=1), grp[:, :, 3].max(axis=1)])
            self.levels.append(parents)
            cur = parents
        self.levels.reverse()  # levels[0] = root level

    def query_boxes(self, qboxes: np.ndarray):
        """qboxes: (k, 4) probe boxes.  Returns (probe_idx, item_idx) arrays
        of all candidate pairs whose bboxes intersect."""
        qboxes = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        k = len(qboxes)
        if self.n == 0 or k == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        # frontier: (probe, node) pairs at current level
        probes = np.arange(k, dtype=np.int64)
        root_nodes = np.arange(len(self.levels[0]), dtype=np.int64)
        pi = np.repeat(probes, len(root_nodes))
        ni = np.tile(root_nodes, k)
        for lvl, boxes in enumerate(self.levels):
            b = boxes[ni]
            q = qboxes[pi]
            hit = ((b[:, 0] <= q[:, 2]) & (q[:, 0] <= b[:, 2])
                   & (b[:, 1] <= q[:, 3]) & (q[:, 1] <= b[:, 3]))
            pi, ni = pi[hit], ni[hit]
            if lvl == len(self.levels) - 1:
                break
            # expand each surviving node into its children at the next level
            child_count = self.leaf_size
            next_len = len(self.levels[lvl + 1])
            base = ni * child_count
            pi = np.repeat(pi, child_count)
            ni = (base[:, None] + np.arange(child_count)[None, :]).ravel()
            keep = ni < next_len
            pi, ni = pi[keep], ni[keep]
        return pi, self.order[ni]

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """Candidate (point_idx, item_idx) pairs where the point falls in
        the item's bbox."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        q = np.column_stack([px, py, px, py])
        return self.query_boxes(q)
