"""Where does LUT stage-2 time go: HBM row gathers or the VPU blend?

Replicates ops/lut_pipeline.lut_ensemble_packed with parts knocked out:
  gathers-only  — rows fetched, blend replaced by a plain lane-sum
  blend-only    — rows replaced by a broadcast constant (no gather)
  index-only    — just the cell-index arithmetic + fraction planes
Chained steady state at the headline workload (3×360×640 int32 input).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lerf_tpu.config import enable_jit_cache; enable_jit_cache()

from lerf_tpu.ops.lut_pipeline import (MAX_PAD, PackedTables,
                                       _pad_all_sides, build_packed_tables)
from lerf_tpu.ops.simplex import simplex_weights16

H, W = 360, 640
MODES = ("s", "c", "t")


from _timing import chain_time  # noqa: E402  (shared timer)


def ensemble_variant(img, packed, modes, *, interval=4, do_gather=True,
                     do_blend=True):
    q = 1 << interval
    B = 1 << (8 - interval)
    h, w = img.shape[-2], img.shape[-1]
    xpad = _pad_all_sides(img)
    out = None
    for mode in modes:
        for g in packed.groups[mode]:
            deltas, perms, canon = g["deltas"], g["perms"], g["canon"]
            oc = g["oc"]
            u0 = min(d[0] for d in deltas)
            v0 = min(d[1] for d in deltas)
            ha = h + max(d[0] for d in deltas) - u0
            wa = w + max(d[1] for d in deltas) - v0
            planes = [xpad[..., MAX_PAD + u0 + ci:MAX_PAD + u0 + ci + ha,
                           MAX_PAD + v0 + cj:MAX_PAD + v0 + cj + wa]
                      for ci, cj in canon]
            iv = [p // q for p in planes]
            cell = ((iv[0] * B + iv[1]) * B + iv[2]) * B + iv[3]
            if do_gather:
                rows = jnp.take(g["table"], cell, axis=0).astype(jnp.int32)
            else:
                rows = (cell[..., None] +
                        jnp.arange(g["table"].shape[1], dtype=jnp.int32))
            if not do_blend:
                member = jnp.sum(rows, axis=-1)[..., :h, :w, None]
                out = member if out is None else out + member
                continue
            for gi, (delta, perm) in enumerate(zip(deltas, perms)):
                su, sv = delta[0] - u0, delta[1] - v0
                win = (Ellipsis, slice(su, su + h), slice(sv, sv + w))
                fr = [planes[perm[k]][win] % q for k in range(4)]
                bit_of = tuple(1 << (3 - perm[k]) for k in range(4))
                w16 = simplex_weights16(*fr, q, bit_of=bit_of)
                chans = []
                for c_ in range(oc):
                    lane0 = (gi * oc + c_) * 16
                    c16 = rows[win + (slice(lane0, lane0 + 16),)]
                    chans.append(jnp.sum(w16 * c16, axis=-1))
                member = jnp.stack(chans, axis=-1)
                out = member if out is None else out + member
    return out


def main():
    from bench import load_flat_luts

    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    s1f, s2f = load_flat_luts()
    s2 = build_packed_tables({k: v.astype(np.int8) for k, v in s2f.items()},
                             MODES, split_r=True)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (3, H, W)).astype(np.int32))

    for name, kw in (("full", {}),
                     ("gathers-only", dict(do_blend=False)),
                     ("blend-only", dict(do_gather=False))):
        @jax.jit
        def f(x, kw=kw):
            out = ensemble_variant(x, s2, MODES, **kw)
            return (x + out[..., 0].astype(jnp.int32)) % 256

        t = chain_time(f, img)
        print(f"stage2 {name:13s}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
