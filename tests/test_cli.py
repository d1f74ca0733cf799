"""CLI subcommands exercised in-process (argparse -> handlers)."""

import json

import numpy as np
import pytest

from icpx.cli import main
from icpx.cloud import PointCloud
from icpx.io import load_cloud, save_cloud
from icpx.io.loaders import synthetic_surface


@pytest.fixture
def cloud_file(tmp_path):
    path = tmp_path / "src.pcd"
    save_cloud(path, PointCloud.create(synthetic_surface(800, seed=0)))
    return path


def test_info(cloud_file, capsys):
    assert main(["info", str(cloud_file)]) == 0
    out = capsys.readouterr().out
    assert "800 points" in out


def test_convert(cloud_file, tmp_path, capsys):
    out = tmp_path / "out.ply"
    assert main(["convert", str(cloud_file), str(out)]) == 0
    back = load_cloud(out)
    assert int(back.num_valid()) == 800


def test_perturb_then_register(cloud_file, tmp_path, capsys):
    tgt = tmp_path / "tgt.pcd"
    assert main([
        "perturb", str(cloud_file), str(tgt),
        "--angle", "0.2", "--translate", "0.1", "0", "0",
    ]) == 0
    aligned = tmp_path / "aligned.pcd"
    metrics = tmp_path / "m.jsonl"
    assert main([
        "register", str(cloud_file), str(tgt),
        "--max-iters", "12", "--diff-threshold", "1e-5",
        "--out", str(aligned), "--metrics", str(metrics),
    ]) == 0
    out = capsys.readouterr().out
    assert "iters#1 / diff:" in out  # reference-format trace
    assert "transform:" in out
    recs = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert recs[-1]["event"] == "icp_done"
    # aligned cloud ~= target
    a = load_cloud(aligned).to_numpy()
    b = load_cloud(tgt).to_numpy()
    d = np.abs(np.sort(a[:, 0]) - np.sort(b[:, 0])).mean()
    assert d < 1e-3


def test_horn(cloud_file, tmp_path, capsys):
    tgt = tmp_path / "t.pcd"
    main(["perturb", str(cloud_file), str(tgt), "--angle", "0.3"])
    assert main(["horn", str(cloud_file), str(tgt)]) == 0
    assert "R:" in capsys.readouterr().out


def test_odometry_synthetic(tmp_path, capsys):
    metrics = tmp_path / "odo.jsonl"
    ck = tmp_path / "odo.npz"
    assert main([
        "odometry", "--synthetic", "--frames", "5",
        "--points-per-scan", "1024",
        "--metrics", str(metrics), "--checkpoint", str(ck),
    ]) == 0
    out = capsys.readouterr().out
    assert "5 frames" in out
    assert ck.exists()
    assert len(metrics.read_text().splitlines()) == 5


def test_register_config_override(cloud_file, tmp_path):
    cfgf = tmp_path / "cfg.json"
    cfgf.write_text(json.dumps({"robust": "huber", "max_iters": 3}))
    assert main([
        "register", str(cloud_file), str(cloud_file), "--config", str(cfgf)
    ]) == 0


def test_bad_odometry_args():
    with pytest.raises(SystemExit):
        main(["odometry"])  # no source given


def test_odometry_cli_resume_matches_full(tmp_path, capsys):
    """icpx odometry --resume continues a killed run to the same
    trajectory (synthetic frames are prefix-stable in --frames)."""
    ck_full = tmp_path / "full.npz"
    ck_part = tmp_path / "part.npz"
    ck_res = tmp_path / "resumed.npz"
    common = ["odometry", "--synthetic", "--points-per-scan", "1024"]
    assert main(common + ["--frames", "8", "--checkpoint", str(ck_full)]) == 0
    assert main(common + ["--frames", "5", "--checkpoint", str(ck_part)]) == 0
    assert main(common + [
        "--frames", "8", "--resume", str(ck_part),
        "--checkpoint", str(ck_res),
    ]) == 0
    assert "resuming from" in capsys.readouterr().out
    from icpx.utils.checkpoint import OdometryCheckpoint

    full = OdometryCheckpoint.load(ck_full)
    res = OdometryCheckpoint.load(ck_res)
    np.testing.assert_allclose(res.poses_t, full.poses_t, atol=1e-6)
    np.testing.assert_allclose(res.poses_R, full.poses_R, atol=1e-6)
    assert [e[:2] for e in res.edges] == [e[:2] for e in full.edges]


def test_register_ndt_objective(cloud_file, tmp_path, capsys):
    tgt = tmp_path / "nt.pcd"
    main(["perturb", str(cloud_file), str(tgt), "--angle", "0.1"])
    assert main([
        "register", str(cloud_file), str(tgt),
        "--objective", "ndt", "--ndt-cell", "32", "--max-iters", "25",
        "--diff-threshold", "0",
    ]) == 0
    assert "converged" in capsys.readouterr().out


def test_compiled_rejects_host_only_flags(tmp_path):
    import pytest

    with pytest.raises(SystemExit, match="--compiled does not support"):
        main([
            "odometry", "--synthetic", "--frames", "4",
            "--points-per-scan", "512", "--compiled",
            "--resume", str(tmp_path / "x.npz"),
        ])
    with pytest.raises(SystemExit, match="dynamic-sigma"):
        main([
            "odometry", "--synthetic", "--frames", "4",
            "--points-per-scan", "512", "--compiled",
            "--dynamic-sigma", "3.0",
        ])


def test_register_ndt_rejects_pyramid(cloud_file, tmp_path):
    import pytest

    tgt = tmp_path / "t2.pcd"
    main(["perturb", str(cloud_file), str(tgt), "--angle", "0.1"])
    with pytest.raises(SystemExit, match="ndt does not compose"):
        main([
            "register", str(cloud_file), str(tgt),
            "--objective", "ndt", "--pyramid-levels", "2",
        ])
