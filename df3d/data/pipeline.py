"""Input pipeline: pad-to-static batches + background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler stacks
(SURVEY §2.6 data sharding): each host builds batches for ITS shard of the
global batch (per-host sharding replaces DistributedSampler), a worker
thread pool overlaps IO/augmentation with device compute, and every array
is padded to static shapes before it reaches jax.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np


def pad_to(arr: np.ndarray, n: int, fill=0.0) -> np.ndarray:
    """Pad/truncate leading dim to n."""
    if len(arr) >= n:
        return arr[:n]
    pad = np.full((n - len(arr),) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad])


def make_batch(
    samples: list[dict], max_points: int, max_gt: int, num_features: int,
) -> dict:
    """Assemble a padded train batch from dataset samples."""
    b = len(samples)
    points = np.zeros((b, max_points, num_features), np.float32)
    points_valid = np.zeros((b, max_points), bool)
    gt_boxes = np.zeros((b, max_gt, 9), np.float32)
    gt_classes = np.zeros((b, max_gt), np.int32)
    gt_valid = np.zeros((b, max_gt), bool)
    aug = {
        "noise_rot": np.zeros((b,), np.float32),
        "noise_scale": np.ones((b,), np.float32),
        "flip_x": np.zeros((b,), bool),
        "flip_y": np.zeros((b,), bool),
    }
    for i, s in enumerate(samples):
        p = s["points"][:max_points]
        points[i, : len(p), : p.shape[1]] = p
        points_valid[i, : len(p)] = True
        if "gt_boxes" in s and len(s["gt_boxes"]):
            g = s["gt_boxes"][:max_gt]
            gt_boxes[i, : len(g), : g.shape[1]] = g
            gt_classes[i, : len(g)] = s["gt_classes"][:max_gt]
            gt_valid[i, : len(g)] = True
        if "aug_params" in s:
            ap = s["aug_params"]
            aug["noise_rot"][i] = ap.noise_rot
            aug["noise_scale"][i] = ap.noise_scale
            aug["flip_x"][i] = ap.flip_x
            aug["flip_y"][i] = ap.flip_y
    return {
        "points": points, "points_valid": points_valid,
        "gt_boxes": gt_boxes, "gt_classes": gt_classes, "gt_valid": gt_valid,
        **aug,
    }


class PrefetchLoader:
    """Thread-prefetching batch iterator over a map-style dataset."""

    def __init__(
        self, dataset, batch_size: int, collate: Callable[[list], dict],
        shuffle: bool = True, seed: int = 0, num_workers: int = 2,
        prefetch: int = 2, shard_id: int = 0, num_shards: int = 1,
        transform: Callable | None = None, drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.transform = transform
        self.drop_last = drop_last
        self.epoch = 0

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host shard (replaces DistributedSampler)
        return idx[self.shard_id::self.num_shards]

    def __iter__(self) -> Iterator[dict]:
        # class-balanced wrappers (CBGSWrapper) redraw their duplicate set
        # each epoch, mirroring per-run reference draws without freezing one
        if hasattr(self.dataset, "resample"):
            self.dataset.resample(self.epoch)
        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            rng = np.random.RandomState(self.seed * 7919 + self.epoch)
            for b in range(nb):
                sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                samples = []
                for i in sel:
                    s = self.dataset[int(i)]
                    if self.transform is not None:
                        s = self.transform(s, rng)
                    samples.append(s)
                q.put(self.collate(samples))
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        self.epoch += 1
