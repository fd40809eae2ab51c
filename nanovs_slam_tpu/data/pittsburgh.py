"""Pittsburgh 30k/250k VPR dataset (NetVLAD .mat dbStruct format).

Behavioral contract (reference: src/data/pittsburgh.py):
- parse_db_struct (:120-156): MATLAB struct with db/query image lists and
  UTM coordinates, posDistThr/posDistSqThr/nonTrivPosDistSqThr.
- WholeDatasetFromStruct (:159-200): db followed by query images;
  getPositives() = db indices within posDistThr meters (sklearn kNN).
- QueryDatasetFromStruct (:234-354): triplet mining against a cached
  descriptor store — nontrivial positives within sqrt(nonTrivPosDistSqThr),
  negatives sampled outside posDistThr, VIOLATING negatives within
  margin of the best positive distance, with per-query negCache.
"""

from __future__ import annotations

import os
from collections import namedtuple
from typing import List, Optional, Tuple

import numpy as np

DbStruct = namedtuple(
    "DbStruct",
    ["whichSet", "dataset", "dbImage", "utmDb", "qImage", "utmQ", "numDb",
     "numQ", "posDistThr", "posDistSqThr", "nonTrivPosDistSqThr"])


def _cell_to_str(f) -> str:
    """Unwrap a loadmat cell entry to a plain string (handles varying
    nesting between real NetVLAD mats and savemat round-trips)."""
    v = f
    while not isinstance(v, str):
        if hasattr(v, "item") and getattr(v, "size", 2) == 1:
            v = v.item()
        else:
            v = v[0]
    return v


def parse_db_struct(path: str) -> DbStruct:
    from scipy.io import loadmat

    mat = loadmat(path)
    m = mat["dbStruct"].item()
    dataset = "pitts"
    which_set = _cell_to_str(m[0])
    db_image = [_cell_to_str(f) for f in m[1]]
    utm_db = m[2].T
    q_image = [_cell_to_str(f) for f in m[3]]
    utm_q = m[4].T
    num_db = int(m[5].item())
    num_q = int(m[6].item())
    pos_dist_thr = m[7].item()
    pos_dist_sq_thr = m[8].item()
    non_triv_pos_dist_sq_thr = m[9].item()
    return DbStruct(which_set, dataset, db_image, utm_db, q_image, utm_q,
                    num_db, num_q, pos_dist_thr, pos_dist_sq_thr,
                    non_triv_pos_dist_sq_thr)


class WholeDataset:
    """db + query images in one indexable set; getPositives() gives the
    UTM-radius ground truth used by evaluate_global_descriptor."""

    def __init__(self, struct_path: str, img_root: str,
                 size: Tuple[int, int]):
        self.dbStruct = parse_db_struct(struct_path)
        self.img_root = img_root
        self.size = size
        self.images = ([os.path.join(img_root, im)
                        for im in self.dbStruct.dbImage]
                       + [os.path.join(img_root, "queries_real", im)
                          for im in self.dbStruct.qImage])
        self._positives: Optional[List[np.ndarray]] = None

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i: int) -> np.ndarray:
        import cv2

        img = cv2.cvtColor(cv2.imread(self.images[i]), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (self.size[1], self.size[0]))
        return (img.astype(np.float32) / 255.0) * 2.0 - 1.0

    def get_positives(self) -> List[np.ndarray]:
        if self._positives is None:
            from sklearn.neighbors import NearestNeighbors

            knn = NearestNeighbors(n_jobs=-1)
            knn.fit(self.dbStruct.utmDb)
            self._positives = list(knn.radius_neighbors(
                self.dbStruct.utmQ, radius=self.dbStruct.posDistThr,
                return_distance=False))
        return self._positives


class TripletMiningDataset:
    """Hard-negative mining against a descriptor cache
    (QueryDatasetFromStruct, pittsburgh.py:234-354)."""

    def __init__(self, struct_path: str, img_root: str,
                 size: Tuple[int, int], n_neg_sample: int = 1000,
                 n_neg: int = 10, margin: float = 0.1, seed: int = 0):
        self.dbStruct = parse_db_struct(struct_path)
        self.img_root = img_root
        self.size = size
        self.n_neg_sample = n_neg_sample
        self.n_neg = n_neg
        self.margin = margin
        self.rng = np.random.RandomState(seed)

        from sklearn.neighbors import NearestNeighbors

        knn = NearestNeighbors(n_jobs=-1)
        knn.fit(self.dbStruct.utmDb)
        # nontrivial positives (sorted by distance)
        self.nontrivial_positives = []
        dists, positives = knn.radius_neighbors(
            self.dbStruct.utmQ,
            radius=np.sqrt(self.dbStruct.nonTrivPosDistSqThr),
            return_distance=True)
        for d, p in zip(dists, positives):
            self.nontrivial_positives.append(np.sort(p[np.argsort(d)]))
        # potential negatives: everything outside posDistThr
        potential_pos = knn.radius_neighbors(
            self.dbStruct.utmQ, radius=self.dbStruct.posDistThr,
            return_distance=False)
        self.potential_negatives = [
            np.setdiff1d(np.arange(self.dbStruct.numDb), p,
                         assume_unique=True) for p in potential_pos]
        self.neg_cache = [np.empty((0,), np.int64)
                          for _ in range(self.dbStruct.numQ)]
        self.queries = [i for i in range(self.dbStruct.numQ)
                        if len(self.nontrivial_positives[i]) > 0]
        self.cache: Optional[np.ndarray] = None  # (numDb+numQ, D) features

    def __len__(self):
        return len(self.queries)

    def _load(self, path: str) -> np.ndarray:
        import cv2

        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (self.size[1], self.size[0]))
        return (img.astype(np.float32) / 255.0) * 2.0 - 1.0

    def mine(self, index: int):
        """Returns (q_img, pos_img, neg_imgs (n_neg,...)) or None if no
        violating negatives exist for this query."""
        assert self.cache is not None, "set .cache to mined features first"
        q = self.queries[index]
        q_offset = self.dbStruct.numDb
        q_feat = self.cache[q_offset + q]

        pos_ids = self.nontrivial_positives[q]
        pos_feat = self.cache[pos_ids]
        d_pos = np.linalg.norm(pos_feat - q_feat, axis=1)
        best = np.argmin(d_pos)
        pos_idx = pos_ids[best]
        d_pos_best = d_pos[best]

        neg_sample = self.rng.choice(self.potential_negatives[q],
                                     min(self.n_neg_sample,
                                         len(self.potential_negatives[q])),
                                     replace=False)
        neg_sample = np.unique(np.concatenate(
            [self.neg_cache[q], neg_sample]))
        neg_feat = self.cache[neg_sample]
        d_neg = np.linalg.norm(neg_feat - q_feat, axis=1)
        # violating: closer than best positive + margin
        violating = d_neg < d_pos_best + self.margin ** 0.5
        if violating.sum() < 1:
            return None
        order = np.argsort(d_neg)
        neg_ids = neg_sample[order[violating[order]][: self.n_neg * 10]
                             ][: self.n_neg]
        self.neg_cache[q] = neg_ids

        q_img = self._load(os.path.join(self.img_root, "queries_real",
                                        self.dbStruct.qImage[q]))
        pos_img = self._load(os.path.join(self.img_root,
                                          self.dbStruct.dbImage[pos_idx]))
        neg_imgs = np.stack([
            self._load(os.path.join(self.img_root, self.dbStruct.dbImage[n]))
            for n in neg_ids])
        return q_img, pos_img, neg_imgs
