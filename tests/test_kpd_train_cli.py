"""KPD training CLI smoke test on a tiny synthetic dataset."""

import os

import numpy as np
import pytest

pytest.importorskip("cv2")

from betapose_tpu.data.annot import write_annot_h5


@pytest.fixture
def tiny_kpd_data(tmp_path):
    import cv2
    rng = np.random.default_rng(0)
    root = tmp_path / "data"
    for split, n in (("train", 6), ("eval", 3)):
        (root / split).mkdir(parents=True)
        names, bbs, parts = [], [], []
        for i in range(n):
            name = "%012d.png" % i
            img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
            cv2.imwrite(str(root / split / name), img)
            names.append(name)
            bbs.append(np.array([[30.0, 20.0, 130.0, 100.0]]))
            parts.append(rng.uniform(40, 95, (4, 2)))
        write_annot_h5(str(root / f"annot_{split}.h5"), names,
                       np.stack(bbs), np.stack(parts))
    return str(root)


@pytest.mark.slow
def test_train_cli_runs_and_resumes(tiny_kpd_data, tmp_path):
    from betapose_tpu.train import train_kpd_main
    argv = [
        "--expID", "t", "--nClasses", "4", "--netType", "resnet50",
        "--optMethod", "adam", "--trainBatch", "3", "--validBatch", "3",
        "--nEpochs", "1", "--snapshot", "1", "--valid_every", "1",
        "--inputResH", "64", "--inputResW", "32",
        "--outputResH", "16", "--outputResW", "8",
        "--annot_dir", tiny_kpd_data, "--img_dir", tiny_kpd_data,
        "--exp_root", str(tmp_path / "exp"),
        "--tb_root", str(tmp_path / "tb"),
        "--n_devices", "1",
    ]
    train_kpd_main.main(argv)
    exp_dir = tmp_path / "exp" / "coco" / "t"
    assert (exp_dir / "model_0.npz").exists()
    assert (exp_dir / "optimizer.npz").exists()
    assert (exp_dir / "model_final.npz").exists()
    assert (tmp_path / "tb" / "coco" / "t" / "metrics.jsonl").exists()
    # resume via --Continue
    train_kpd_main.main(argv + ["--Continue", "1", "--nEpochs", "2"])


def test_unknown_nettype_rejected(tmp_path):
    from betapose_tpu.train import train_kpd_main
    with pytest.raises(ValueError, match="netType"):
        train_kpd_main.main(["--netType", "hourglass",
                             "--annot_dir", str(tmp_path)])


@pytest.mark.slow
def test_train_cli_hgprm(tiny_kpd_data, tmp_path):
    """--netType hgPRM trains the PyraNet stacked hourglass with
    intermediate supervision (no silent fallback to resnet101)."""
    from betapose_tpu.train import train_kpd_main
    argv = [
        "--expID", "hg", "--nClasses", "4", "--netType", "hgPRM",
        "--nStack", "1", "--nFeats", "16", "--baseWidth", "4",
        "--cardinality", "2",
        "--optMethod", "adam", "--trainBatch", "3", "--validBatch", "3",
        "--nEpochs", "1", "--snapshot", "1", "--valid_every", "1",
        # the depth-4 hourglass needs the heatmap res (inputRes/4)
        # divisible by 16 (reference runs 320x256 -> 80x64)
        "--inputResH", "128", "--inputResW", "64",
        "--outputResH", "32", "--outputResW", "16",
        "--annot_dir", tiny_kpd_data, "--img_dir", tiny_kpd_data,
        "--exp_root", str(tmp_path / "exp"),
        "--tb_root", str(tmp_path / "tb"),
        "--n_devices", "1",
    ]
    train_kpd_main.main(argv)
    exp_dir = tmp_path / "exp" / "coco" / "hg"
    assert (exp_dir / "model_final.npz").exists()


class TestSymPerms:
    """--symPerms loading/validation (the symmetry-aware loss hookup)."""

    def test_load_npy_and_text(self, tmp_path):
        from betapose_tpu.train.train_kpd_main import load_sym_perms
        perm = np.array([1, 0, 3, 2])
        npy = tmp_path / "p.npy"
        np.save(npy, perm)
        (p,) = load_sym_perms(str(npy), 4)
        np.testing.assert_array_equal(p, perm)
        txt = tmp_path / "p.txt"
        txt.write_text("1,0,3,2\n2, 3, 0, 1\n")
        p1, p2 = load_sym_perms(str(txt), 4)
        np.testing.assert_array_equal(p1, perm)
        np.testing.assert_array_equal(p2, [2, 3, 0, 1])

    def test_rejects_non_permutation(self, tmp_path):
        from betapose_tpu.train.train_kpd_main import load_sym_perms
        bad = tmp_path / "bad.txt"
        bad.write_text("0,0,1,2\n")
        with pytest.raises(ValueError):
            load_sym_perms(str(bad), 4)

    def test_rejects_wrong_length(self, tmp_path):
        from betapose_tpu.train.train_kpd_main import load_sym_perms
        bad = tmp_path / "bad.npy"
        np.save(bad, np.array([1, 0, 2]))
        with pytest.raises(ValueError):
            load_sym_perms(str(bad), 4)


@pytest.mark.slow
def test_train_cli_sym_perms(tiny_kpd_data, tmp_path):
    """One epoch with --symPerms: the min-over-modes loss trains through
    the real CLI (symmetric-object capability on the reference-parity
    trainer surface)."""
    from betapose_tpu.train import train_kpd_main
    pfile = tmp_path / "perm.txt"
    pfile.write_text("1,0,3,2\n")
    argv = [
        "--expID", "sym", "--nClasses", "4", "--netType", "resnet50",
        "--optMethod", "adam", "--trainBatch", "3", "--validBatch", "3",
        "--nEpochs", "1", "--snapshot", "1", "--valid_every", "1",
        "--inputResH", "64", "--inputResW", "32",
        "--outputResH", "16", "--outputResW", "8",
        "--annot_dir", tiny_kpd_data, "--img_dir", tiny_kpd_data,
        "--exp_root", str(tmp_path / "exp"),
        "--tb_root", str(tmp_path / "tb"),
        "--n_devices", "1",
        "--symPerms", str(pfile),
    ]
    train_kpd_main.main(argv)
    assert (tmp_path / "exp" / "coco" / "sym" / "model_final.npz").exists()
