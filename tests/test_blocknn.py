"""Block-sparse (Morton-tiled IVF) NN: recall vs brute force, and ICP
convergence using nn_method="block"."""

import jax.numpy as jnp
import numpy as np

from icpx.cloud import PointCloud
from icpx.geometry.se3 import SE3
from icpx.io.loaders import synthetic_surface
from icpx.kernels.blocknn import block_nn, build_tile_index, morton_keys
from icpx.kernels.knn import _nearest_neighbor_jnp
from icpx.registration.icp import ICPConfig, register


def test_build_tile_index_shapes(rng):
    xyz = rng.normal(size=(1000, 3)).astype(np.float32)
    idx = build_tile_index(xyz, tile_size=128)
    assert idx.tiles.shape == (8, 128, 3)
    order = np.asarray(idx.order)
    assert sorted(order[order >= 0].tolist()) == list(range(1000))


def test_block_nn_recall_surface(rng):
    r = synthetic_surface(20000, seed=0)
    q = synthetic_surface(20000, seed=1)
    ridx = build_tile_index(r, tile_size=256)
    qidx = build_tile_index(q, tile_size=64)
    d_v, i_v = block_nn(qidx.tiles, ridx, k_tiles=8)
    # compare in sorted-query order
    q_sorted = np.asarray(qidx.tiles).reshape(-1, 3)
    valid = np.asarray(qidx.order) >= 0
    d_b, _ = _nearest_neighbor_jnp(jnp.asarray(q_sorted), jnp.asarray(r))
    d_v, d_b = np.asarray(d_v)[valid], np.asarray(d_b)[valid]
    miss = (d_v > d_b + 1e-6).mean()
    # misses return genuine (larger) distances; robust ICP absorbs ~1%
    assert miss < 0.01, f"miss rate {miss}"
    # and the missed ones are still close (within ~4x the true distance)
    ratio = np.sqrt(d_v[d_v > d_b + 1e-6] / np.maximum(d_b[d_v > d_b + 1e-6], 1e-12))
    if len(ratio):
        assert np.median(ratio) < 4.0


def test_block_nn_volume_recall(rng):
    r = rng.uniform(-1, 1, (30000, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, (10000, 3)).astype(np.float32)
    ridx = build_tile_index(r, tile_size=256)
    qidx = build_tile_index(q, tile_size=64)
    d_v, i_v = block_nn(qidx.tiles, ridx, k_tiles=8)
    valid = np.asarray(qidx.order) >= 0
    d_b, _ = _nearest_neighbor_jnp(
        jnp.asarray(np.asarray(qidx.tiles).reshape(-1, 3)), jnp.asarray(r)
    )
    miss = (np.asarray(d_v)[valid] > np.asarray(d_b)[valid] + 1e-6).mean()
    # uniform volumes are the worst case for tile selection
    assert miss < 0.08, f"miss rate {miss}"


def test_block_nn_indices_are_original(rng):
    r = rng.normal(size=(5000, 3)).astype(np.float32)
    ridx = build_tile_index(r, tile_size=256)
    qidx = build_tile_index(r, tile_size=256)  # self query
    d, i = block_nn(qidx.tiles, ridx, k_tiles=4)
    valid = np.asarray(qidx.order) >= 0
    # each sorted query is its own NN: returned index must be the original id
    expect = np.asarray(qidx.order)[valid]
    assert np.array_equal(np.asarray(i)[valid], expect)
    assert np.allclose(np.asarray(d)[valid], 0.0, atol=1e-6)


def test_icp_with_block_nn_converges():
    n = 4096
    xyz = synthetic_surface(n, seed=0)
    src = PointCloud.create(xyz)
    gt = SE3.from_axis_angle(
        jnp.asarray([0.1, 0.2, 0.974]) / np.linalg.norm([0.1, 0.2, 0.974]),
        0.2,
        jnp.asarray([0.1, -0.05, 0.06]),
    )
    rng = np.random.default_rng(1)
    tgt = PointCloud.create(
        np.asarray(gt.apply(src.xyz))[:n][rng.permutation(n)]
    )
    cfg = ICPConfig(
        objective="symmetric",
        max_iters=15,
        diff_threshold=1e-4,
        nn_method="block",
    )
    res = register(src, tgt, cfg)
    rot_err, t_err = res.transform.distance_to(gt)
    assert float(rot_err) < 3e-3 and float(t_err) < 3e-3


def test_morton_locality():
    """Morton-adjacent points are spatially close on average."""
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0, 1, (4096, 3)).astype(np.float32)
    keys = np.asarray(
        morton_keys(
            jnp.asarray(xyz), jnp.zeros(3), jnp.ones(3)
        )
    )
    order = np.argsort(keys)
    s = xyz[order]
    step = np.linalg.norm(np.diff(s, axis=0), axis=1).mean()
    rand_step = np.linalg.norm(np.diff(xyz, axis=0), axis=1).mean()
    assert step < rand_step * 0.35

def test_kd_index_shapes_and_order(rng):
    from icpx.kernels.blocknn import build_kd_index

    xyz = rng.normal(size=(1000, 3)).astype(np.float32)
    idx = build_kd_index(xyz, tile_size=128)
    assert idx.tiles.shape == (8, 128, 3)
    order = np.asarray(idx.order)
    assert sorted(order[order >= 0].tolist()) == list(range(1000))


def test_kd_index_recall_surface(rng):
    """VERDICT round-1 item 3: >=99.9% recall with KD-split tiles at the
    default operating point (S=128, Sq=32, K=12 -- 25% less fold work than
    the round-1 Morton S=256/Sq=64/K=8 default)."""
    from icpx.kernels.blocknn import build_kd_index

    r = synthetic_surface(20000, seed=0)
    q = synthetic_surface(20000, seed=1)
    ridx = build_kd_index(r, tile_size=128)
    qidx = build_kd_index(q, tile_size=32)
    d_v, _ = block_nn(qidx.tiles, ridx, k_tiles=12)
    valid = np.asarray(qidx.order) >= 0
    d_b, _ = _nearest_neighbor_jnp(
        jnp.asarray(np.asarray(qidx.tiles).reshape(-1, 3)), jnp.asarray(r)
    )
    miss = (np.asarray(d_v)[valid] > np.asarray(d_b)[valid] + 1e-6).mean()
    assert miss < 0.001, f"miss rate {miss}"


def test_kd_index_recall_volume(rng):
    """Uniform volume is the Morton worst case; KD tiles must fix it."""
    from icpx.kernels.blocknn import build_kd_index

    r = rng.uniform(-1, 1, (30000, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, (10000, 3)).astype(np.float32)
    ridx = build_kd_index(r, tile_size=128)
    qidx = build_kd_index(q, tile_size=32)
    d_v, _ = block_nn(qidx.tiles, ridx, k_tiles=12)
    valid = np.asarray(qidx.order) >= 0
    d_b, _ = _nearest_neighbor_jnp(
        jnp.asarray(np.asarray(qidx.tiles).reshape(-1, 3)), jnp.asarray(r)
    )
    miss = (np.asarray(d_v)[valid] > np.asarray(d_b)[valid] + 1e-6).mean()
    assert miss < 0.001, f"miss rate {miss}"


def test_kd_index_masked(rng):
    from icpx.kernels.blocknn import build_kd_index

    xyz = rng.normal(size=(700, 3)).astype(np.float32)
    mask = rng.uniform(size=(700,)) > 0.3
    idx = build_kd_index(xyz, jnp.asarray(mask), tile_size=64)
    order = np.asarray(idx.order)
    got = sorted(order[order >= 0].tolist())
    assert got == sorted(np.nonzero(mask)[0].tolist())
    # sentinel coords on padding rows
    tiles = np.asarray(idx.tiles).reshape(-1, 3)
    assert np.all(np.abs(tiles[order < 0]) >= 1e6)


def test_fused4_matches_brute(rng):
    """The kept fused kernel (take 4, interpret mode) returns exact NN on
    data where the candidate union covers the true tile."""
    from icpx.kernels.blocknn import build_kd_index
    from icpx.kernels.blocknn_pallas import block_nn_fused4

    r = rng.uniform(-1, 1, (8000, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
    ridx = build_kd_index(r, tile_size=128)
    qidx = build_kd_index(q, tile_size=32)
    d_f, i_f = block_nn_fused4(
        qidx.tiles, ridx, k_tiles=12, group=4, u_max=32, interpret=True
    )
    valid = np.asarray(qidx.order) >= 0
    d_b, i_b = _nearest_neighbor_jnp(
        jnp.asarray(np.asarray(qidx.tiles).reshape(-1, 3)), jnp.asarray(r)
    )
    assert (np.asarray(i_f)[valid] == np.asarray(i_b)[valid]).mean() > 0.999
    miss = (np.asarray(d_f)[valid] > np.asarray(d_b)[valid] + 1e-6).mean()
    assert miss < 0.001


def test_fused_moments_superset_of_jnp(rng):
    """Fused radius moments sees a candidate-union superset: neighbor
    counts are >= the jnp fold's, and equal-count rows agree to fp32."""
    from icpx.kernels.blocknn import build_kd_index, block_radius_moments
    from icpx.kernels.blocknn_pallas import block_radius_moments_fused

    r = rng.uniform(-1, 1, (8000, 3)).astype(np.float32)
    idx = build_kd_index(r, tile_size=128)
    radius = jnp.float32(0.15)
    cnt_f, mean_f, cov_f = block_radius_moments_fused(
        idx.tiles, idx, radius, k_tiles=8, group=4, u_max=32, interpret=True
    )
    cnt_j, mean_j, cov_j = block_radius_moments(
        idx.tiles, idx, radius, k_tiles=8
    )
    valid = np.asarray(idx.order) >= 0
    cf, cj = np.asarray(cnt_f)[valid], np.asarray(cnt_j)[valid]
    assert np.all(cf >= cj)
    same = cf == cj
    assert same.mean() > 0.8
    assert np.abs(np.asarray(mean_f)[valid][same] - np.asarray(mean_j)[valid][same]).max() < 1e-5
    assert np.abs(np.asarray(cov_f)[valid][same] - np.asarray(cov_j)[valid][same]).max() < 1e-5


def test_moments6_matches_jnp_fold(rng):
    """Take-6 VMEM moments (per-tile candidates, pre-centered S-minor
    operands) reproduce the jnp fold's counts/means/covs at the SAME
    k_tiles — same candidate lists, so exact agreement to fp32 noise,
    not the union-superset contract of the take-4 kernel."""
    from icpx.kernels.blocknn import build_kd_index, block_radius_moments
    from icpx.kernels.blocknn_pallas import block_radius_moments_fused6

    r = rng.uniform(-1, 1, (8000, 3)).astype(np.float32)
    idx = build_kd_index(r, tile_size=128)
    radius = jnp.float32(0.15)
    cnt_6, mean_6, cov_6 = block_radius_moments_fused6(
        idx.tiles, idx, radius, k_tiles=4, interpret=True
    )
    cnt_j, mean_j, cov_j = block_radius_moments(
        idx.tiles, idx, radius, k_tiles=4
    )
    valid = np.asarray(idx.order) >= 0
    np.testing.assert_array_equal(
        np.asarray(cnt_6)[valid], np.asarray(cnt_j)[valid]
    )
    assert np.abs(
        np.asarray(mean_6)[valid] - np.asarray(mean_j)[valid]
    ).max() < 1e-5
    assert np.abs(
        np.asarray(cov_6)[valid] - np.asarray(cov_j)[valid]
    ).max() < 1e-4
    # SoA variant (round 5): component covariances match the AoS tensor
    # exactly (same kernel output, different packing), and the SoA
    # eigensolver agrees with the AoS wrapper on the derived normal.
    from icpx.kernels.eigh3 import (
        smallest_eigenvector_3x3,
        smallest_eigenvector_3x3_soa,
    )

    cnt_s, mean_s, comps = block_radius_moments_fused6(
        idx.tiles, idx, radius, k_tiles=4, interpret=True, soa=True
    )
    np.testing.assert_array_equal(np.asarray(cnt_s), np.asarray(cnt_6))
    np.testing.assert_allclose(
        np.asarray(mean_s), np.asarray(mean_6), atol=1e-6
    )
    c00, c01, c02, c11, c12, c22 = (np.asarray(c) for c in comps)
    cov_np = np.asarray(cov_6)
    np.testing.assert_allclose(c00, cov_np[:, 0, 0], atol=1e-6)
    np.testing.assert_allclose(c01, cov_np[:, 0, 1], atol=1e-6)
    np.testing.assert_allclose(c02, cov_np[:, 0, 2], atol=1e-6)
    np.testing.assert_allclose(c11, cov_np[:, 1, 1], atol=1e-6)
    np.testing.assert_allclose(c12, cov_np[:, 1, 2], atol=1e-6)
    np.testing.assert_allclose(c22, cov_np[:, 2, 2], atol=1e-6)
    (vx, vy, vz), _ = smallest_eigenvector_3x3_soa(*comps)
    v_aos, _ = smallest_eigenvector_3x3(jnp.asarray(cov_np))
    v_soa = np.stack([np.asarray(vx), np.asarray(vy), np.asarray(vz)], 1)
    ok = np.asarray(cnt_s) >= 3
    dots = np.abs(np.sum(v_soa[ok] * np.asarray(v_aos)[ok], axis=1))
    assert dots.min() > 1.0 - 1e-5


def test_default_operating_point_recall(rng):
    """Recall at the REGISTRATION defaults (S=128, Sq=64, coarse k=8 /
    refine k=6). The refine phase runs on nearly-aligned clouds, so its
    recall is measured in that regime (query = reference + small jitter);
    the coarse phase sees unaligned clouds at k=8 over merged parent
    query tiles and tolerates distance-inflating misses by design."""
    from icpx.kernels.blocknn import build_kd_index

    r = rng.uniform(-1, 1, (40000, 3)).astype(np.float32)
    q = (r + rng.normal(0, 0.002, r.shape)).astype(np.float32)
    ridx = build_kd_index(r, tile_size=128)
    qidx = build_kd_index(q, tile_size=64)
    d_v, _ = block_nn(qidx.tiles, ridx, k_tiles=6)
    valid = np.asarray(qidx.order) >= 0
    d_b, _ = _nearest_neighbor_jnp(
        jnp.asarray(np.asarray(qidx.tiles).reshape(-1, 3)), jnp.asarray(r)
    )
    miss = (np.asarray(d_v)[valid] > np.asarray(d_b)[valid] + 1e-6).mean()
    assert miss < 0.002, f"refine-regime miss rate {miss}"


def test_hierarchical_candidate_selection_recall(rng, monkeypatch):
    """The two-level (super-tile) candidate ranking used above
    _HIER_MIN_TILES must preserve recall; forced on here by lowering the
    threshold so CPU-sized clouds exercise it."""
    import icpx.kernels.blocknn as bnn

    import jax as _jax

    r = rng.uniform(-1, 1, (36864, 3)).astype(np.float32)
    q = (r + rng.normal(0, 0.002, r.shape)).astype(np.float32)
    ridx = bnn.build_kd_index(r, tile_size=128)  # 512 tiles
    qidx = bnn.build_kd_index(q, tile_size=64)

    def nn_d(k_tiles):
        d, _ = _jax.jit(
            bnn.block_nn, static_argnames=("k_tiles",)
        )(qidx.tiles, ridx, k_tiles=k_tiles)
        return np.asarray(d)

    d_flat = nn_d(6)
    # non-trivial hierarchy: 32 super-tiles of 16, only 8 expanded
    monkeypatch.setattr(bnn, "_HIER_MIN_TILES", 64)
    monkeypatch.setattr(bnn, "_SUPER_G", 16)
    d_hier = nn_d(7)  # different static arg -> fresh trace, patched path
    valid = np.asarray(qidx.order) >= 0
    # selecting from expanded super-tiles must reproduce the flat
    # ranking's NN for essentially every query (k=7 hierarchical vs k=6
    # flat: any extra misses are hierarchy-induced)
    worse = (d_hier[valid] > d_flat[valid] + 1e-6).mean()
    assert worse < 0.002, f"hierarchy-induced miss rate {worse}"


def test_feature_augmented_nn(rng):
    """block_nn with a feature channel matches brute-force 4D NN in the
    metric ||p-q||^2 + w^2 (f_p - f_q)^2."""
    from icpx.kernels.blocknn import build_kd_index, tile_payload

    n = 4096
    r = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    f_r = rng.uniform(0, 1, (n,)).astype(np.float32)
    q = (r + rng.normal(0, 0.01, r.shape)).astype(np.float32)
    f_q = rng.uniform(0, 1, (n,)).astype(np.float32)
    w = 0.7

    ridx = build_kd_index(r, tile_size=64)
    qidx = build_kd_index(q, tile_size=32)
    feat_tiles = tile_payload(ridx, jnp.asarray(f_r)[:, None])[..., 0]
    qvalid = np.asarray(qidx.order) >= 0
    qsafe = np.maximum(np.asarray(qidx.order), 0)
    query_feat = jnp.asarray(
        np.where(qvalid, f_q[qsafe], 0.0).astype(np.float32)
    ).reshape(qidx.n_tiles, qidx.tile_size)

    d_v, idx_v = block_nn(
        qidx.tiles, ridx, k_tiles=10, query_feat=query_feat,
        feat_tiles=feat_tiles, feat_weight=w,
    )
    # brute 4D reference
    qs = np.asarray(qidx.tiles).reshape(-1, 3)
    fq = np.asarray(query_feat).reshape(-1)
    d4 = (
        ((qs[:, None, :] - r[None, :, :]) ** 2).sum(-1)
        + w * w * (fq[:, None] - f_r[None, :]) ** 2
    )
    ref_idx = d4.argmin(1)
    ref_d = d4.min(1)
    got_d = np.asarray(d_v)[qvalid]
    agree = (np.asarray(idx_v)[qvalid] == ref_idx[qvalid]).mean()
    assert agree > 0.995, agree
    np.testing.assert_allclose(
        got_d[np.asarray(idx_v)[qvalid] == ref_idx[qvalid]],
        ref_d[qvalid][np.asarray(idx_v)[qvalid] == ref_idx[qvalid]],
        rtol=1e-3, atol=1e-5,
    )


def test_feature_augmented_nn_chunked(rng):
    """The chunked (lax.map) path carries feature channels identically
    to the unchunked one."""
    from icpx.kernels.blocknn import build_kd_index, tile_payload

    n = 4096
    r = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    f_r = rng.uniform(0, 1, (n,)).astype(np.float32)
    q = (r + rng.normal(0, 0.01, r.shape)).astype(np.float32)
    f_q = rng.uniform(0, 1, (n,)).astype(np.float32)

    ridx = build_kd_index(r, tile_size=64)
    qidx = build_kd_index(q, tile_size=32)
    feat_tiles = tile_payload(ridx, jnp.asarray(f_r)[:, None])[..., 0]
    qvalid = np.asarray(qidx.order) >= 0
    qsafe = np.maximum(np.asarray(qidx.order), 0)
    query_feat = jnp.asarray(
        np.where(qvalid, f_q[qsafe], 0.0).astype(np.float32)
    ).reshape(qidx.n_tiles, qidx.tile_size)

    kw = dict(k_tiles=6, query_feat=query_feat, feat_tiles=feat_tiles,
              feat_weight=0.7)
    d_a, i_a = block_nn(qidx.tiles, ridx, **kw)
    d_b, i_b = block_nn(qidx.tiles, ridx, max_chunk=16, **kw)
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), rtol=1e-6)


def test_block_nn_payload_chunked(rng):
    from icpx.kernels.blocknn import (
        block_nn_payload, build_kd_index, tile_payload,
    )

    n = 2048
    r = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    q = (r + rng.normal(0, 0.01, r.shape)).astype(np.float32)
    ridx = build_kd_index(r, tile_size=64)
    qidx = build_kd_index(q, tile_size=32)
    pl = tile_payload(ridx, jnp.asarray(r))
    d_a, p_a = block_nn_payload(qidx.tiles, ridx, pl, k_tiles=6)
    d_b, p_b = block_nn_payload(
        qidx.tiles, ridx, pl, k_tiles=6, max_chunk=8
    )
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b))


def test_block_nn_payload_matches_gather(rng):
    """In-fold payload selection (with frozen candidates and a feature
    channel) returns exactly the rows that block_nn + table gather would
    — the two ICPConfig.payload_mode delivery paths are interchangeable."""
    from icpx.kernels.blocknn import (
        _candidate_tiles, block_nn_payload, build_kd_index, tile_payload,
    )

    n = 4096
    r = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    f_r = rng.uniform(0, 1, (n,)).astype(np.float32)
    q = (r + rng.normal(0, 0.01, r.shape)).astype(np.float32)
    f_q = rng.uniform(0, 1, (n,)).astype(np.float32)
    ridx = build_kd_index(r, tile_size=64)
    qidx = build_kd_index(q, tile_size=32)
    feat_tiles = tile_payload(ridx, jnp.asarray(f_r)[:, None])[..., 0]
    qvalid = np.asarray(qidx.order) >= 0
    qsafe = np.maximum(np.asarray(qidx.order), 0)
    query_feat = jnp.asarray(
        np.where(qvalid, f_q[qsafe], 0.0).astype(np.float32)
    ).reshape(qidx.n_tiles, qidx.tile_size)
    pl = jnp.concatenate(
        [ridx.tiles, tile_payload(ridx, jnp.asarray(r)).reshape(
            ridx.n_tiles, ridx.tile_size, 3)], axis=2
    )  # (T, S, 6)
    cand, _ = _candidate_tiles(qidx.tiles, ridx, 6)

    for kw in (
        dict(),                                   # plain
        dict(cand_tiles=cand),                    # frozen candidates
        dict(query_feat=query_feat, feat_tiles=feat_tiles,
             feat_weight=0.7),                    # 4D metric
        dict(cand_tiles=cand, query_feat=query_feat,
             feat_tiles=feat_tiles, feat_weight=0.7),
        dict(cand_tiles=cand, max_chunk=16),      # chunked + candidates
    ):
        d_g, pos = block_nn(
            qidx.tiles, ridx, k_tiles=6, return_pos=True, **{
                k: v for k, v in kw.items() if k != "max_chunk"}
        )
        pl_g = pl.reshape(-1, 6)[pos]
        d_f, pl_f = block_nn_payload(qidx.tiles, ridx, pl, k_tiles=6, **kw)
        ok = np.isfinite(np.asarray(d_g))
        np.testing.assert_allclose(
            np.asarray(d_f)[ok], np.asarray(d_g)[ok], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pl_f)[ok], np.asarray(pl_g)[ok], atol=1e-6
        )


def test_register_payload_modes_equivalent(rng):
    """payload_mode=gather and =infold produce identical registrations
    on the block path (miss rows gated identically)."""
    from icpx.geometry.transforms import make_rigid_perturbation
    from icpx.registration.icp import _register_jit

    n = 16384
    xyz = synthetic_surface(n, seed=3)
    src = PointCloud.create(xyz, capacity=n)
    gt = make_rigid_perturbation(angle=0.15, translation=(0.1, -0.05, 0.02))
    tgt_np = np.asarray(gt.apply(src.xyz))[:n]
    perm = rng.permutation(n)
    tgt = PointCloud.create(tgt_np[perm], capacity=n).replace(
        mask=src.mask[perm]
    )
    results = {}
    for mode in ("gather", "infold", "select", "vmem", "vmem7"):
        cfg = ICPConfig(
            max_iters=8, diff_threshold=0.0, rmse_change_tol=1e-6,
            nn_method="block", payload_mode=mode,
        )
        res = _register_jit(
            src, tgt, SE3.identity(), cfg, normals_for=("src", "tgt")
        )
        rot_err, t_err = res.transform.distance_to(gt)
        assert float(rot_err) < 5e-3 and float(t_err) < 5e-3, mode
        results[mode] = res
    for other in ("infold", "select", "vmem", "vmem7"):
        np.testing.assert_allclose(
            np.asarray(results["gather"].transform.R),
            np.asarray(results[other].transform.R),
            atol=1e-5, err_msg=other,
        )
        if other == "vmem":
            # take-6 scores on the f32 VPU: near-tie NN picks differ,
            # so histories agree only to the converged noise floor, and
            # the stop can shift by an iter.
            assert (
                abs(
                    float(results[other].final_rmse)
                    - float(results["gather"].final_rmse)
                )
                < 5e-6
            )
            continue
        if other == "vmem7":
            # take-7 scores on the centered-bf16 MXU — the same
            # precision class as the TPU defaults' XLA fold
            # (score_precision="auto"->bf16): REPORTED distances carry a
            # bf16 noise floor ~ (tile extent)^2 * 2^-9, so final_rmse
            # floors near 1e-3 here while the POSE (solved from
            # f32-exact payload coordinates) matches to fp32 (asserted
            # above on R).
            assert float(results[other].final_rmse) < 2e-3
            continue
        np.testing.assert_allclose(
            np.asarray(results["gather"].rmse_history),
            np.asarray(results[other].rmse_history),
            rtol=1e-4, atol=1e-7, err_msg=other,
        )


def test_vmem_without_frozen_candidates_never_gathers(rng):
    """pmode="vmem" with no frozen candidate list (coarse disabled)
    resolves to infold above payload_infold_threshold — NOT the silent
    super-linear row-gather fallthrough (VERDICT r4 weak #3) — and the
    registration matches the gather path's pose."""
    from icpx.registration.icp import (
        _effective_payload_mode,
        _register_jit,
    )

    # resolution contract, every branch:
    cfg = ICPConfig(payload_mode="vmem", payload_infold_threshold=4096)
    kw = dict(use_feat=False, fused=False)
    assert (
        _effective_payload_mode(cfg, 16384, will_freeze=False, **kw)
        == "infold"
    )
    assert (
        _effective_payload_mode(cfg, 2048, will_freeze=False, **kw)
        == "gather"
    )
    assert (
        _effective_payload_mode(cfg, 16384, will_freeze=True, **kw)
        == "vmem"
    )
    assert (
        _effective_payload_mode(
            cfg, 16384, use_feat=True, fused=False, will_freeze=True
        )
        == "infold"
    )

    # behavioral parity: coarse_iters=0 + payload_mode="vmem" registers
    # (on the resolved infold path) to the same pose as explicit gather
    from icpx.geometry.transforms import make_rigid_perturbation

    n = 16384
    xyz = synthetic_surface(n, seed=7)
    src = PointCloud.create(xyz, capacity=n)
    gt = make_rigid_perturbation(angle=0.1, translation=(0.08, -0.04, 0.02))
    tgt_np = np.asarray(gt.apply(src.xyz))[:n]
    perm = rng.permutation(n)
    tgt = PointCloud.create(tgt_np[perm], capacity=n).replace(
        mask=src.mask[perm]
    )
    results = {}
    for mode in ("vmem", "gather"):
        cfg = ICPConfig(
            max_iters=8, diff_threshold=0.0, rmse_change_tol=1e-6,
            nn_method="block", payload_mode=mode, coarse_iters=0,
            payload_infold_threshold=4096,
        )
        res = _register_jit(
            src, tgt, SE3.identity(), cfg, normals_for=("src", "tgt")
        )
        rot_err, t_err = res.transform.distance_to(gt)
        assert float(rot_err) < 5e-3 and float(t_err) < 5e-3, mode
        results[mode] = res
    np.testing.assert_allclose(
        np.asarray(results["vmem"].transform.R),
        np.asarray(results["gather"].transform.R),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(results["vmem"].transform.t),
        np.asarray(results["gather"].transform.t),
        atol=1e-4,
    )


def test_refine_stride_parity_and_history(rng):
    """Explicit refine_stride=2 agrees with stride 1 on the recovered
    pose, in the 8M bench combination (infold payload + Sq=128 query
    tiles) scaled down to CPU size. (Auto no longer engages stride 2
    anywhere: the 8M chip A/B measured it losing end-to-end — NOTES
    round-4; the knob remains for explicit use and this test keeps its
    correctness pinned.) Also pins the round-4 history contract: the
    mid phase's diff/rmse iterations are merged into the returned
    histories (sized config.max_iters), total refine iterations stay
    within max_iters, and a mid-phase stop carries into `converged`."""
    from icpx.geometry.transforms import make_rigid_perturbation
    from icpx.registration.icp import _register_jit

    n = 40960
    xyz = synthetic_surface(n, seed=11)
    src = PointCloud.create(xyz, capacity=n)
    gt = make_rigid_perturbation(angle=0.2, translation=(0.15, -0.1, 0.05))
    tgt_np = np.asarray(gt.apply(src.xyz))[:n]
    perm = rng.permutation(n)
    tgt = PointCloud.create(tgt_np[perm], capacity=n).replace(
        mask=src.mask[perm]
    )
    results = {}
    for stride in (1, 2):
        cfg = ICPConfig(
            max_iters=10, diff_threshold=0.0, rmse_change_tol=1e-6,
            nn_method="block", payload_mode="infold", block_q_tile=128,
            block_q_tile_large=0, refine_stride=stride,
        )
        res = _register_jit(
            src, tgt, SE3.identity(), cfg, normals_for=("src", "tgt")
        )
        rot_err, t_err = res.transform.distance_to(gt)
        assert float(rot_err) < 5e-3 and float(t_err) < 5e-3, stride
        results[stride] = res
    # pose parity: the strided mid phase must land on the same pose
    np.testing.assert_allclose(
        np.asarray(results[1].transform.R),
        np.asarray(results[2].transform.R),
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(results[1].transform.t),
        np.asarray(results[2].transform.t),
        atol=2e-3,
    )
    res2 = results[2]
    assert res2.diff_history.shape == (10,)
    assert res2.rmse_history.shape == (10,)
    coarse_iters = 2  # config default; counted in iters, not histories
    refine_iters = int(res2.iters) - coarse_iters
    assert refine_iters <= 10  # max_iters bounds mid + full-res tail
    diffs = np.asarray(res2.diff_history)
    assert int(np.isfinite(diffs).sum()) == refine_iters
    # histories are contiguous from the front (mid first, then tail)
    assert np.all(np.isfinite(diffs[:refine_iters]))
    assert not np.any(np.isfinite(diffs[refine_iters:]))
    # rmse_change_tol stopped the mid phase; converged must carry
    assert bool(res2.converged)


def test_register_batch_block_matches_single(rng):
    """The vmapped block batch (round-4 small-pair path) recovers the
    same poses as running each pair through the single-pair block
    pipeline — the batch axis must not perturb builds, in-jit normals,
    candidate ranking, or the phase schedule."""
    from icpx.geometry.transforms import make_rigid_perturbation
    from icpx.registration.icp import (
        _register_jit,
        register_batch_block,
    )

    b, n = 2, 40960
    cfg = ICPConfig(
        max_iters=8, diff_threshold=0.0, rmse_change_tol=1e-6,
        nn_method="block",
    )
    sxs, txs, gts = [], [], []
    for i in range(b):
        xyz = synthetic_surface(n, seed=20 + i)
        gt = make_rigid_perturbation(
            angle=0.12 + 0.03 * i, translation=(0.1, -0.04 * i, 0.02)
        )
        txs.append(np.asarray(gt.apply(jnp.asarray(xyz)))[rng.permutation(n)])
        sxs.append(xyz)
        gts.append(gt)
    sx = jnp.stack([jnp.asarray(s) for s in sxs])
    tx = jnp.stack([jnp.asarray(t) for t in txs])
    ones = jnp.ones((b, n), bool)
    res_b = register_batch_block(sx, ones, tx, ones, cfg)
    for i in range(b):
        Tb = SE3(R=res_b.transform.R[i], t=res_b.transform.t[i])
        rot_err, t_err = Tb.distance_to(gts[i])
        assert float(rot_err) < 5e-3 and float(t_err) < 5e-3
        # single-pair reference (register() centers; replicate by hand
        # is unnecessary — identical tgt centroid handling in both paths)
        from icpx.registration.icp import register as _register

        res_1 = _register(
            PointCloud(xyz=sx[i], mask=ones[i]),
            PointCloud(xyz=tx[i], mask=ones[i]),
            cfg,
        )
        np.testing.assert_allclose(
            np.asarray(Tb.R), np.asarray(res_1.transform.R), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(Tb.t), np.asarray(res_1.transform.t), atol=2e-4
        )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="block"):
        register_batch_block(
            sx[:, :1024], ones[:, :1024], tx[:, :1024], ones[:, :1024],
            ICPConfig(),
        )


def test_trim_index_valid_prefix(rng):
    """trim_index relies on valid rows occupying a global prefix of the
    sorted layout; verify it and the view's correctness for both builders
    at a non-power-of-two size with a holey mask."""
    from icpx.kernels.blocknn import build_kd_index, trim_index

    n = 5 * 256 + 17
    xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    mask = rng.uniform(size=n) > 0.2
    for builder in (build_kd_index, build_tile_index):
        idx = builder(jnp.asarray(xyz), jnp.asarray(mask), tile_size=64)
        order = np.asarray(idx.order)
        n_valid = int(mask.sum())
        assert (order[:n_valid] >= 0).all(), builder.__name__
        assert (order[n_valid:] < 0).all(), builder.__name__
        view = trim_index(idx, n, multiple=4)
        if view.n_tiles < idx.n_tiles:  # actually trimmed (KD pads to po2)
            assert view.n_tiles % 4 == 0
        assert view.n_tiles * 64 >= n
        # every valid row survives the trim
        assert (np.asarray(view.order) >= 0).sum() == n_valid
        # NN through the view matches NN through the full index
        q = xyz[:256].reshape(4, 64, 3)
        d_f, i_f = block_nn(jnp.asarray(q), idx, k_tiles=6)
        d_v, i_v = block_nn(jnp.asarray(q), view, k_tiles=6)
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_v))
        np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_v))


def test_register_non_pow2_capacity():
    """Block registration at a non-power-of-two capacity (the KD builder
    pads tiles to the next power of two; trim_index slices the pure-pad
    tail so per-iteration work scales with the real size)."""
    from icpx.geometry.transforms import make_rigid_perturbation

    n = 40960  # 5 * 8192: tile count 640 -> padded 1024 -> trimmed 640
    xyz = synthetic_surface(n, seed=0)
    src = PointCloud.create(xyz)
    gt = make_rigid_perturbation(angle=0.2, translation=(0.12, -0.06, 0.03))
    rng = np.random.default_rng(1)
    tgt_np = np.asarray(gt.apply(src.xyz))[: src.capacity]
    perm = rng.permutation(src.capacity)
    tgt = PointCloud.create(tgt_np[perm], capacity=src.capacity).replace(
        mask=src.mask[perm]
    )
    cfg = ICPConfig(
        max_iters=10, diff_threshold=0.0, rmse_change_tol=1e-6,
        nn_method="block",
    )
    from icpx.registration.icp import _register_jit

    res = _register_jit(
        src, tgt, SE3.identity(), cfg, normals_for=("src", "tgt")
    )
    rot_err, t_err = res.transform.distance_to(gt)
    assert float(rot_err) < 5e-3, float(rot_err)
    assert float(t_err) < 5e-3, float(t_err)


def test_kd_index_qform_large_builds(rng):
    """Large builds round the tile count to q*2^k (q in [64, 128])
    instead of a full power of two — a 10M-point cloud's 81920 tiles
    otherwise pad to 131072 and every build sort pays 2x rows. Verify
    the q-form build: correct tile count, global valid prefix (the
    trim_index invariant), exact point recovery, and recall parity
    with brute force."""
    from icpx.kernels.blocknn import build_kd_index, trim_index

    n = 40000  # tile_size=8 -> t=5000 >= 4096 triggers the q-form
    xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    idx = build_kd_index(jnp.asarray(xyz), tile_size=8)
    # q-form: 5000 -> k=6, q=ceil(5000/64)=79, t2=79*64=5056 (not 8192)
    assert idx.n_tiles == 5056
    assert idx.n_tiles % 64 == 0  # hierarchical-ranking requirement
    order = np.asarray(idx.order)
    assert (order[:n] >= 0).all() and (order[n:] < 0).all()
    assert sorted(order[order >= 0].tolist()) == list(range(n))

    # Recall sanity. The bound is LOOSE because S=8 is an extreme
    # regime (k_tiles=12 x 8 = 96-point candidate pools; same-occupancy
    # po2 misses 3.0% here, q-form 4.5%): full tiles cover more volume
    # per candidate than the old padding's ~62%-occupied ones. The
    # design-point gates are test_default_operating_point_recall (S=128,
    # CPU) and the 10M chip bench, where the q-form build left rmse and
    # GT recovery bit-unchanged (5.90e-3) while cutting the wall
    # 2439 -> 2264 ms (build sorts run 10.5M rows instead of 16.8M).
    q = synthetic_surface(4096, seed=7)
    qidx = build_kd_index(q, tile_size=32)
    d_v, _ = block_nn(qidx.tiles, trim_index(idx, n), k_tiles=12)
    valid = np.asarray(qidx.order) >= 0
    d_b, _ = _nearest_neighbor_jnp(
        jnp.asarray(np.asarray(qidx.tiles).reshape(-1, 3)),
        jnp.asarray(xyz),
    )
    miss = (np.asarray(d_v)[valid] > np.asarray(d_b)[valid] + 1e-6).mean()
    assert miss < 0.06, f"miss rate {miss}"
