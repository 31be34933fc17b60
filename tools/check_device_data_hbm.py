"""Verify DeviceDataset.hbm_bytes against real device memory stats.

Run on the TPU: builds a tiled DeviceDataset, reads bytes_in_use before and
after, and reports the ratio (uint8 NHWC stacks may carry layout padding —
this documents the actual cost).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bytes_in_use(dev):
    stats = dev.memory_stats() or {}
    return stats.get("bytes_in_use", 0)


def main():
    import jax

    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    sizes = [(180, 320), (240, 200), (256, 256)] * 8
    lrs = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for h, w in sizes]
    hrs = [rng.randint(0, 256, (2 * h, 2 * w, 3), dtype=np.uint8)
           for h, w in sizes]

    from lerf_tpu.data.device_data import DeviceDataset

    before = bytes_in_use(dev)
    ds = DeviceDataset(lrs, hrs, scale=2, crop_size=48, in_c=1, tile=64)
    jax.block_until_ready((ds.lr, ds.hr))
    after = bytes_in_use(dev)
    logical = ds.hbm_bytes
    actual = after - before
    print(json.dumps({
        "logical_bytes": logical,
        "device_bytes": actual,
        "ratio": round(actual / logical, 3) if logical else None,
        "n_tiles": int(ds.lr.shape[0]),
    }))


if __name__ == "__main__":
    main()
