"""Packed rotation-group tables: bit-exact vs the flat ensemble path."""
import numpy as np
import pytest

import jax.numpy as jnp

from lerf_tpu.ops.lut_pipeline import (
    MODE_OFFSETS, build_packed_tables, group_rotations, lut_ensemble,
    lut_stage1, lut_stage2, rotate_offset,
)

RNG = np.random.RandomState


def rand_luts(modes, oc, split_r, seed=0):
    rng = RNG(seed)
    keys = [f"{m}r{r}" for m in modes for r in (0, 1)] if split_r \
        else list(modes)
    return {k: jnp.asarray(
        rng.randint(-127, 128, (17 ** 4, oc)).astype(np.int32))
        for k in keys}


@pytest.mark.parametrize("mode,n_groups", [
    ("s", 1), ("d", 1), ("c", 2), ("t", 2), ("y", 4),
])
def test_group_rotations_counts(mode, n_groups):
    groups = group_rotations(mode)
    assert len(groups) == n_groups
    assert sorted(r for g in groups for r in g["rots"]) == [0, 1, 2, 3]
    # the decomposition reproduces every rotated offset exactly
    for g in groups:
        for r, delta, perm in zip(g["rots"], g["deltas"], g["perms"]):
            want = [rotate_offset(off, r) for off in MODE_OFFSETS[mode]]
            got = [(delta[0] + g["canon"][perm[k]][0],
                    delta[1] + g["canon"][perm[k]][1]) for k in range(4)]
            assert got == want


@pytest.mark.parametrize("modes,split_r,oc", [
    (("s", "c", "t"), False, 1),
    (("s", "c", "t"), True, 3),
    (("s", "d", "y"), False, 1),
    (("s",), True, 1),
])
def test_packed_ensemble_bit_exact(modes, split_r, oc):
    luts = rand_luts(modes, oc, split_r, seed=len(modes) + oc)
    packed = build_packed_tables(luts, modes, split_r=split_r)
    img = jnp.asarray(RNG(3).randint(0, 256, (2, 9, 13)).astype(np.int32))
    want = np.asarray(lut_ensemble(img, luts, modes, split_r=split_r))
    got = np.asarray(lut_ensemble(img, packed, modes, split_r=split_r))
    np.testing.assert_array_equal(got, want)


def test_packed_ensemble_interval5_bit_exact():
    """Packed tables honor a non-default --interval (fast tier: L=9, q=32;
    the large-L direction is covered by the slow interval-3 test)."""
    interval, oc = 5, 3
    L = (1 << (8 - interval)) + 1
    rng = RNG(11)
    luts = {f"{m}r{r}": jnp.asarray(
        rng.randint(-127, 128, (L ** 4, oc)).astype(np.int32))
        for m in ("s", "c") for r in (0, 1)}
    packed = build_packed_tables(luts, ("s", "c"), split_r=True,
                                 interval=interval)
    img = jnp.asarray(RNG(12).randint(0, 256, (2, 8, 10)).astype(np.int32))
    want = np.asarray(lut_ensemble(img, luts, ("s", "c"), split_r=True,
                                   interval=interval))
    got = np.asarray(lut_ensemble(img, packed, ("s", "c"), split_r=True,
                                  interval=interval))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_packed_ensemble_interval3_bit_exact():
    """Packed tables honor a non-default --interval (L=33, q=8).

    Slow tier: building the 33⁴-cell packed tables is ~2 min of host
    memory traffic on this VM; the fast tier covers the same code path
    with interval=5 (L=9) above."""
    interval, oc = 3, 3
    L = (1 << (8 - interval)) + 1
    rng = RNG(11)
    luts = {f"{m}r{r}": jnp.asarray(
        rng.randint(-127, 128, (L ** 4, oc)).astype(np.int32))
        for m in ("s", "c") for r in (0, 1)}
    packed = build_packed_tables(luts, ("s", "c"), split_r=True,
                                 interval=interval)
    img = jnp.asarray(RNG(12).randint(0, 256, (2, 8, 10)).astype(np.int32))
    want = np.asarray(lut_ensemble(img, luts, ("s", "c"), split_r=True,
                                   interval=interval))
    got = np.asarray(lut_ensemble(img, packed, ("s", "c"), split_r=True,
                                  interval=interval))
    np.testing.assert_array_equal(got, want)


def test_packed_int8_tables_bit_exact():
    luts = rand_luts(("s", "c", "t"), 3, True, seed=9)
    luts8 = {k: np.asarray(v).astype(np.int8) for k, v in luts.items()}
    packed8 = build_packed_tables(luts8, ("s", "c", "t"), split_r=True)
    img = jnp.asarray(RNG(4).randint(0, 256, (1, 7, 11)).astype(np.int32))
    want = np.asarray(lut_ensemble(img, luts, ("s", "c", "t"), split_r=True))
    got = np.asarray(lut_ensemble(img, packed8, ("s", "c", "t"),
                                  split_r=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.smoke
def test_packed_stages_bit_exact():
    s1 = rand_luts(("s", "c", "t"), 1, False, seed=20)
    s2 = rand_luts(("s", "c", "t"), 3, True, seed=21)
    p1 = build_packed_tables(s1, ("s", "c", "t"))
    p2 = build_packed_tables(s2, ("s", "c", "t"), split_r=True)
    img = jnp.asarray(RNG(5).randint(0, 256, (3, 10, 12)).astype(np.int32))
    feat_want = np.asarray(lut_stage1(img, s1, ("s", "c", "t")))
    feat = lut_stage1(img, p1, ("s", "c", "t"))
    np.testing.assert_array_equal(np.asarray(feat), feat_want)
    hyper_want = np.asarray(lut_stage2(feat, s2, ("s", "c", "t")))
    got = np.asarray(lut_stage2(feat, p2, ("s", "c", "t")))
    np.testing.assert_array_equal(got, hyper_want)


def test_banded_stages_bit_exact():
    """Row-banded stage execution (large-input gather-rate fix) is
    bit-identical to unbanded: each band carries a MAX_PAD halo of real
    pixels, and at true borders the band's edge-pad equals the image's."""
    import numpy as np

    from lerf_tpu.ops.lut_pipeline import (build_packed_tables, lut_stage1,
                                           lut_stage2)

    rng = np.random.RandomState(3)
    # interval=5 (L=9): banding logic (MAX_PAD halos, band splits) is
    # interval-independent, and the small tables keep the multi-MB LUT
    # constants out of the traced graphs (big closures defeat both trace
    # speed and the persistent compile cache's economics)
    interval = 5
    Lk = ((1 << (8 - interval)) + 1) ** 4
    # "s" (1 rotation group) + "c" (2 groups) cover both grouping shapes;
    # "t" duplicates "c"'s structure and only adds runtime here.
    modes = ("s", "c")
    s1 = build_packed_tables(
        {m: rng.randint(-127, 128, (Lk, 1)).astype(np.int8) for m in modes},
        modes, interval=interval)
    s2 = build_packed_tables(
        {f"{m}r{r}": rng.randint(-127, 128, (Lk, 3)).astype(np.int8)
         for m in modes for r in (0, 1)}, modes, split_r=True,
        interval=interval)
    # 14 rows / 5-row bands: a non-divisor split (5+5+4) whose first band
    # halo-clamps at the top border, last at the bottom, middle carries
    # full halos — every banding case in one split.  Each band is a full
    # stage-ensemble TRACE (hundreds of primitives, uncacheable), so more
    # band sizes only add runtime, not coverage.
    img = jnp.asarray(rng.randint(0, 256, (1, 14, 19)).astype(np.int32))

    import jax

    def stages(x, bt):
        f = lut_stage1(x, s1, modes, interval=interval, band_target=bt)
        return f, lut_stage2(f, s2, modes, interval=interval,
                             band_target=bt)

    f_ref, h_ref = jax.jit(lambda x: stages(x, 10 ** 9))(img)
    f_got, h_got = jax.jit(lambda x: stages(x, 19 * 5))(img)
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_got))
    np.testing.assert_array_equal(np.asarray(h_ref), np.asarray(h_got))
