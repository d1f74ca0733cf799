"""Cloud container + PCD/PLY/txt I/O tests.

Parity targets: the reference's fixtures and PCL I/O call sites
(`myicp.cpp:22-26`, `test.cpp:58`); round-trips formalize §4's test plan.
"""

import numpy as np
import pytest

from icpx.cloud import PAD_COORD, PointCloud
from icpx.io import (
    load_cloud,
    read_pcd,
    read_ply,
    read_xyz_txt,
    save_cloud,
    write_pcd,
    write_ply,
    write_xyz_txt,
)
from icpx.io.loaders import REFERENCE_DATA_DIR, has_reference_data, load_cat_pair

needs_ref = pytest.mark.skipif(
    not has_reference_data(), reason="reference fixtures unavailable"
)


def test_pointcloud_padding(rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    pc = PointCloud.create(xyz)
    assert pc.capacity == 128
    assert int(pc.num_valid()) == 100
    assert np.allclose(pc.to_numpy(), xyz)
    assert np.all(np.asarray(pc.xyz)[100:] == PAD_COORD)


def test_pointcloud_centroid_ignores_padding(rng):
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    pc = PointCloud.create(xyz, capacity=256)
    assert np.allclose(np.asarray(pc.centroid()), xyz.mean(0), atol=1e-5)


def test_pcd_ascii_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(37, 3)).astype(np.float32) * 10
    nrm = rng.normal(size=(37, 3)).astype(np.float32)
    path = tmp_path / "a.pcd"
    write_pcd(path, xyz, normals=nrm)
    rec = read_pcd(path)
    assert np.allclose(rec["xyz"], xyz, atol=1e-5)
    assert np.allclose(rec["normals"], nrm, atol=1e-5)


def test_pcd_binary_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(211, 3)).astype(np.float32)
    path = tmp_path / "b.pcd"
    write_pcd(path, xyz, binary=True)
    rec = read_pcd(path)
    assert np.allclose(rec["xyz"], xyz)


def test_pcd_extra_fields_roundtrip(tmp_path, rng):
    """The cat_out.pcd layout: x y z label normal_* curvature."""
    xyz = rng.normal(size=(10, 3)).astype(np.float32)
    label = np.arange(10, dtype=np.uint32)
    path = tmp_path / "c.pcd"
    write_pcd(
        path,
        xyz,
        normals=np.zeros((10, 3), np.float32),
        extra_fields={"label": label, "curvature": np.zeros(10, np.float32)},
    )
    rec = read_pcd(path)
    assert np.array_equal(rec["label"], label)
    assert np.allclose(rec["xyz"], xyz, atol=1e-5)


def test_ply_roundtrips(tmp_path, rng):
    xyz = rng.normal(size=(64, 3)).astype(np.float32)
    nrm = rng.normal(size=(64, 3)).astype(np.float32)
    for binary in (False, True):
        path = tmp_path / f"r_{binary}.ply"
        write_ply(path, xyz, normals=nrm, binary=binary)
        rec = read_ply(path)
        assert np.allclose(rec["xyz"], xyz, atol=1e-6)
        assert np.allclose(rec["normals"], nrm, atol=1e-6)


def test_xyz_txt_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(93, 3)).astype(np.float32)
    path = tmp_path / "za.txt"
    write_xyz_txt(path, xyz)
    back = read_xyz_txt(path)
    assert np.allclose(back, xyz, atol=1e-5)


def test_load_save_dispatch(tmp_path, rng):
    xyz = rng.normal(size=(20, 3)).astype(np.float32)
    pc = PointCloud.create(xyz)
    for name in ("x.pcd", "x.ply", "x.txt"):
        save_cloud(tmp_path / name, pc)
        back = load_cloud(tmp_path / name)
        assert np.allclose(back.to_numpy(), xyz, atol=1e-5)


def test_load_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_cloud(tmp_path / "nope.pcd")


@needs_ref
def test_reference_cat_pcd():
    rec = read_pcd(REFERENCE_DATA_DIR / "cat.pcd")
    assert rec["xyz"].shape == (3400, 3)


@needs_ref
def test_reference_cat_out_fields():
    rec = read_pcd(REFERENCE_DATA_DIR / "cat_out.pcd")
    assert rec["xyz"].shape == (3400, 3)
    # normals are stored but all zero in the fixture
    assert "normal_x" in rec and not np.any(rec["normal_x"])


@needs_ref
def test_reference_ground_truth_transform():
    """cat_out = Rz(pi/4) cat + (2.5, 0, 0), residual ~1e-5 (SURVEY.md)."""
    src, tgt = load_cat_pair()
    import jax.numpy as jnp

    from icpx.geometry.transforms import make_rigid_perturbation

    gt = make_rigid_perturbation()
    pred = gt.apply(src.xyz)
    err = np.asarray(
        jnp.linalg.norm(pred - tgt.xyz, axis=-1)[np.asarray(src.mask)]
    )
    assert err.max() < 1e-3


@needs_ref
def test_reference_bunny_fixture():
    from icpx.io.loaders import load_bunny

    pc = load_bunny()
    assert int(pc.num_valid()) == 93


def test_payload_feats_roundtrip(tmp_path, rng):
    """Color/intensity payload channels (VERDICT round-1 missing #7):
    PCD scalar fields -> PointCloud.feats -> written back on save."""
    from icpx.cloud import PointCloud, concat
    from icpx.io import load_cloud, save_cloud

    n = 200
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    inten = rng.uniform(0, 1, n).astype(np.float32)
    label = rng.integers(0, 5, n).astype(np.float32)
    cloud = PointCloud.create(
        xyz, feats=np.stack([inten, label], 1),
        feat_names=("intensity", "label"),
    )
    p = tmp_path / "payload.pcd"
    save_cloud(p, cloud, binary=True)
    back = load_cloud(p)
    assert back.feat_names == ("intensity", "label")
    np.testing.assert_allclose(back.feat("intensity")[:n], inten, rtol=1e-6)
    np.testing.assert_allclose(back.feat("label")[:n], label)
    # feats survive structural ops
    grown = back.pad_to(back.capacity + 128)
    assert grown.feats.shape == (back.capacity + 128, 2)
    both = concat(back, back)
    assert both.feat_names == ("intensity", "label")
    assert both.feats.shape[0] == 2 * back.capacity


def test_kitti_bin_reflectance(tmp_path, rng):
    from icpx.io import load_cloud
    from icpx.odometry.kitti import load_kitti_scan_xyzi

    pts = rng.normal(size=(64, 4)).astype(np.float32)
    f = tmp_path / "000000.bin"
    pts.tofile(f)
    cloud = load_cloud(f)
    assert cloud.feat_names == ("reflectance",)
    np.testing.assert_allclose(cloud.feat("reflectance")[:64], pts[:, 3])
    np.testing.assert_allclose(load_kitti_scan_xyzi(f), pts)


def test_wide_integer_payload_not_corrupted(tmp_path):
    """Integer payload columns beyond float32's exact range (2^24) are
    skipped rather than silently rounded (feats are f32 on device)."""
    from icpx.io import load_cloud
    from icpx.io.pcd import write_pcd

    n = 50
    xyz = np.zeros((n, 3), np.float32)
    label = np.arange(20_000_000, 20_000_000 + n, dtype=np.uint32)
    ring = np.arange(n, dtype=np.uint16)
    p = tmp_path / "wide.pcd"
    write_pcd(p, xyz, extra_fields={"label": label, "ring": ring},
              binary=True)
    cloud = load_cloud(p)
    # narrow int kept, wide int dropped (not corrupted)
    assert cloud.feat_names == ("ring",)
    np.testing.assert_allclose(cloud.feat("ring")[:n], ring)
