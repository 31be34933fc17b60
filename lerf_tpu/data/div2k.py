"""DIV2K training data pipeline.

Reference: ``resample/data.py:15-168`` — whole-dataset npy dict caches
(``cache_hr.npy`` / ``cache_lr_x{scale}.npy``, format-compatible so existing
caches are reused), random image + aligned random crop, optional single
channel selection (inC=1), rigid augmentation (flips + rot90), /255, optional
Gaussian noise.

TPU-first: instead of torch DataLoader worker processes, a numpy sampler
thread fills a small queue of ready batches (host RAM → device transfer
overlaps the train step).  Batches are [B, C, h, w] float32 in [0, 1].
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np


def _load_image_dict(folder: str, file_list, suffix: str) -> Dict[str, np.ndarray]:
    from PIL import Image
    out = {}
    for f in file_list:
        out[f] = np.array(Image.open(os.path.join(folder, f + suffix)))
    return out


class DIV2K:
    """Random-crop sampler over the DIV2K 800-image train split."""

    def __init__(self, path: str, scale, crop_size: int = 48,
                 nsigma: float = -1, in_c: int = 1, rigid_aug: bool = True,
                 seed: int = 0, file_list: Optional[Sequence[str]] = None):
        self.scale = scale
        self.sz = crop_size
        self.nsigma = nsigma
        self.in_c = in_c
        self.rigid_aug = rigid_aug
        self.rng = np.random.RandomState(seed)
        if file_list is not None:
            self.file_list = list(file_list)
        else:
            # standard DIV2K train split (data.py:63-64); autodiscover for
            # non-standard layouts
            self.file_list = [str(i).zfill(4) for i in range(1, 801)]
            probe = os.path.join(path, "HR", self.file_list[-1] + ".png")
            if not os.path.exists(probe):
                hr_dir = os.path.join(path, "HR")
                self.file_list = sorted(
                    f[:-4] for f in os.listdir(hr_dir) if f.endswith(".png"))

        hr_cache = os.path.join(path, "cache_hr.npy")
        if not os.path.exists(hr_cache):
            np.save(hr_cache, _load_image_dict(
                os.path.join(path, "HR"), self.file_list, ".png"),
                allow_pickle=True)
        self.hr_ims = np.load(hr_cache, allow_pickle=True).item()

        lr_cache = os.path.join(path, f"cache_lr_x{scale}.npy")
        if not os.path.exists(lr_cache):
            np.save(lr_cache, _load_image_dict(
                os.path.join(path, "LR", f"X{scale}"), self.file_list,
                f"x{scale}.png"), allow_pickle=True)
        self.lr_ims = np.load(lr_cache, allow_pickle=True).item()

    def sample(self) -> Tuple[np.ndarray, np.ndarray]:
        """One (im, lb) pair: [C, sz, sz] / [C, sz·scale, sz·scale] in [0,1]."""
        r = self.rng
        key = self.file_list[r.randint(len(self.file_list))]
        lb = self.hr_ims[key]
        im = self.lr_ims[key]

        sh = im.shape
        i = r.randint(0, sh[0] - self.sz + 1)
        j = r.randint(0, sh[1] - self.sz + 1)
        s = self.scale
        lb = lb[int(i * s):int(i * s) + int(self.sz * s),
                int(j * s):int(j * s) + int(self.sz * s), :]
        im = im[i:i + self.sz, j:j + self.sz, :]

        if self.in_c == 1:
            c = r.randint(3)
            im, lb = im[:, :, c], lb[:, :, c]

        if self.rigid_aug:
            if r.uniform() < 0.5:
                lb, im = np.fliplr(lb), np.fliplr(im)
            if r.uniform() < 0.5:
                lb, im = np.flipud(lb), np.flipud(im)
            k = r.randint(4)
            lb, im = np.rot90(lb, k), np.rot90(im, k)

        lb = lb.astype(np.float32) / 255.0
        im = im.astype(np.float32) / 255.0
        if self.in_c == 1:
            lb, im = lb[None], im[None]
        else:
            lb, im = lb.transpose(2, 0, 1), im.transpose(2, 0, 1)

        if self.nsigma == 0:       # blind noise up to 25/255 like MuLUT
            level = r.uniform(0, 25)
            im = im + r.normal(0, level / 255.0, im.shape).astype(np.float32)
        elif self.nsigma > 0:
            im = im + r.normal(0, self.nsigma / 255.0,
                               im.shape).astype(np.float32)
        return im, lb

    def batch(self, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
        ims, lbs = zip(*(self.sample() for _ in range(batch_size)))
        return np.ascontiguousarray(np.stack(ims)), \
            np.ascontiguousarray(np.stack(lbs))


class Provider:
    """Infinite prefetching batch iterator (reference data.py:15-51).

    A daemon thread keeps ``prefetch`` host batches ready; ``next()`` never
    blocks on image decoding in steady state.
    """

    def __init__(self, dataset: DIV2K, batch_size: int, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        while not self._stop.is_set():
            b = self.dataset.batch(self.batch_size)
            while not self._stop.is_set():
                try:
                    self._q.put(b, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next(self) -> Tuple[np.ndarray, np.ndarray]:
        return self._q.get()

    def close(self):
        self._stop.set()

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            yield self.next()
