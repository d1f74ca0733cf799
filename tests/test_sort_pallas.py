"""Pallas segmented sort == stable lax.sort, bit-exactly (interpret
mode on CPU; the chip A/B lives in scripts/exp_psort.py / NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icpx.kernels.sort_pallas import sort_segments


@pytest.mark.parametrize("c,m", [(4, 1024), (2, 4096)])
def test_sort_segments_matches_stable_lax_sort(c, m):
    rng = np.random.default_rng(0)
    # duplicate-heavy keys: stability is the hard part
    key = jnp.asarray(
        rng.integers(0, m // 8, size=(c, m)).astype(np.float32)
    )
    a = jnp.asarray(rng.normal(size=(c, m)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(c, m)).astype(np.float32))
    o = jnp.asarray(rng.permutation(c * m).reshape(c, m).astype(np.int32))

    ref = jax.lax.sort(
        (key, a, b, o), dimension=1, num_keys=1, is_stable=True
    )
    got = sort_segments(key, (a, b, o), interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_sort_segments_sentinel_tail():
    # PAD_COORD invalids must sink to each segment's tail (KD contract)
    from icpx.cloud import PAD_COORD

    c, m = 2, 1024
    rng = np.random.default_rng(1)
    key = rng.normal(size=(c, m)).astype(np.float32)
    key[0, ::3] = PAD_COORD
    key = jnp.asarray(key)
    o = jnp.asarray(np.tile(np.arange(m, dtype=np.int32), (c, 1)))
    sk, so = sort_segments(key, (o,), interpret=True)
    sk = np.asarray(sk)
    n_valid = int((sk[0] < PAD_COORD).sum())
    assert np.all(sk[0][n_valid:] == PAD_COORD)
    assert np.all(np.diff(sk[0][:n_valid]) >= 0)
