"""Host-side input pipeline: sharded scene reading + threaded prefetch.

The reference feeds the GPU through torch DataLoader worker processes
(src/train.py:274-287). The TPU-native equivalent:

- each host takes a deterministic shard of the scene list
  (``shard_for_hosts``) — the multi-host analog of the single train list;
- a thread pool reads + decodes PNG scenes ahead of the consumer
  (PNG decode releases the GIL in cv2/PIL, so threads scale);
- batches come out as NumPy, ready for ``jax.device_put`` with a
  ``NamedSharding`` over the data axis (see parallel/mesh.py).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Sequence

import numpy as np

from highresnet_tpu.data.collate import Batch, collate
from highresnet_tpu.data.probav import read_imageset


def shard_for_hosts(scene_dirs: Sequence[str], host_id: int, n_hosts: int) -> List[str]:
    """Deterministic per-host shard of the scene list, EQUAL length per host.

    The list is truncated to a multiple of n_hosts before round-robin
    assignment so every host sees the same number of scenes — a
    requirement for collective-running train steps (unequal shards would
    desynchronize per-host step counts and deadlock the collectives).
    """
    n = (len(scene_dirs) // n_hosts) * n_hosts
    return [d for i, d in enumerate(scene_dirs[:n]) if i % n_hosts == host_id]


class BatchLoader:
    """Iterable over collated batches with background prefetch.

    Each epoch reshuffles scene order (seeded, epoch-keyed) and re-samples
    views/patches per scene — matching the reference DataLoader's
    shuffle=True + per-__getitem__ random sampling.
    """

    def __init__(
        self,
        scene_dirs: Sequence[str],
        batch_size: int,
        min_l: int,
        top_k: int = -1,
        beta: float = 0.0,
        create_patches: bool = False,
        patch_size: int = 64,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 4,
    ):
        self.scene_dirs = list(scene_dirs)
        self.batch_size = batch_size
        self.min_l = min_l
        self.top_k = top_k
        self.beta = beta
        self.create_patches = create_patches
        self.patch_size = patch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.scene_dirs)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_scenes(self):
        return len(self.scene_dirs)

    def _epoch_order(self) -> np.ndarray:
        if not self.shuffle:
            return np.arange(len(self.scene_dirs))
        rng = np.random.default_rng((self.seed, self.epoch))
        return rng.permutation(len(self.scene_dirs))

    def _load_scene(self, idx: int, scene_rng: np.random.Generator):
        return read_imageset(
            self.scene_dirs[idx],
            create_patches=self.create_patches,
            patch_size=self.patch_size,
            top_k=self.top_k,
            beta=self.beta,
            rng=scene_rng,
        )

    def __iter__(self) -> Iterator[Batch]:
        order = self._epoch_order()
        n = len(order)
        starts = list(range(0, n, self.batch_size))
        if self.drop_last:
            starts = [s for s in starts if s + self.batch_size <= n]

        out_q: "queue.Queue[tuple[int, Batch | Exception]]" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that wakes up if the consumer abandons the
            iterator (otherwise the producer thread would block forever
            on the full queue and leak itself + its batches)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            import concurrent.futures as cf

            with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for bi, s in enumerate(starts):
                    if stop.is_set():
                        return
                    idxs = order[s : s + self.batch_size]
                    rngs = [
                        np.random.default_rng((self.seed, self.epoch, int(i)))
                        for i in idxs
                    ]
                    try:
                        sets = list(pool.map(self._load_scene, idxs, rngs))
                        if not put_or_stop((bi, collate(sets, self.min_l))):
                            return
                    except Exception as e:  # surface in consumer
                        put_or_stop((bi, e))
                        return
            put_or_stop((-1, None))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                bi, item = out_q.get()
                if bi == -1:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
        self.epoch += 1
