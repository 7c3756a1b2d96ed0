"""Tests for convergence plotting, visualizer, debug harnesses, profiling."""

import os

import numpy as np

from weasal_tpu.utils.convergence import (
    compare_active_learning, compare_convergences_segment, compare_trainings,
    load_training_iterations, load_val_ious, running_mean)
from weasal_tpu.utils.profiling import StepTimer
from weasal_tpu.utils.conf_matrix import analyze, plot, print_to_file


def _fake_log(dirpath, n_iters=2, steps=30):
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(0)
    for it in range(n_iters):
        with open(os.path.join(dirpath, f"training_iteration{it}.txt"),
                  "w") as f:
            f.write("epochs steps out_loss offset_loss train_accuracy "
                    "time \tweak labels (initial): 10 (10)\n")
            t = 0.0
            for s in range(steps):
                t += 0.1
                f.write(f"0 {s} {2.0 / (s + 1):.3f} 0.000 "
                        f"{min(0.1 + 0.02 * s, 0.9):.3f} {t:.3f}\n")
    with open(os.path.join(dirpath, "val_IoUs.txt"), "w") as f:
        for e in range(5):
            f.write(" ".join(f"{0.1 * e + 0.01 * c:.3f}"
                             for c in range(4)) + " \n")


class TestConvergence:

    def test_loaders(self, tmp_path):
        log = str(tmp_path / "Log_x")
        _fake_log(log)
        iters = load_training_iterations(log)
        assert sorted(iters) == [0, 1]
        assert iters[0].shape == (30, 6)
        ious = load_val_ious(log)
        assert ious.shape == (5, 4)

    def test_plots(self, tmp_path):
        logs = [str(tmp_path / "Log_a"), str(tmp_path / "Log_b")]
        for lg in logs:
            _fake_log(lg)
        p1 = compare_trainings(logs, out_path=str(tmp_path / "t.png"))
        p2 = compare_active_learning(logs, out_path=str(tmp_path / "a.png"))
        p3 = compare_convergences_segment(
            logs, class_names=["a", "b", "c", "d"],
            out_path=str(tmp_path / "v.png"))
        for p in (p1, p2, p3):
            assert os.path.exists(p)

    def test_running_mean(self):
        x = np.ones(100)
        np.testing.assert_allclose(running_mean(x, 5)[10:90], 1.0)


class TestConfMatrixReport:

    def test_analyze_and_plot(self, tmp_path):
        C = np.array([[50, 5, 0], [3, 40, 7], [0, 2, 60]])
        stats = analyze(C)
        assert 0.8 < stats["oa"] < 1.0
        assert stats["iou"].shape == (3,)
        path = plot(C, {0: "a", 1: "b", 2: "c"}, str(tmp_path),
                    file_suffix="test")
        assert os.path.exists(path)
        print_to_file(C, {0: "a", 1: "b", 2: "c"},
                      str(tmp_path / "conf.txt"))
        text = open(tmp_path / "conf.txt").read()
        assert "OA" in text and "iou" in text


class TestVisualizerAndDebug:

    def test_show_batch_and_debug(self, tmp_path):
        from weasal_tpu.config import Config
        from weasal_tpu.data.demo import demo_batch
        from weasal_tpu.utils.visualizer import show_batch

        class C(Config):
            num_classes = 5
            in_features_dim = 4
            in_radius = 4.0
            first_subsampling_dl = 0.5
            conv_radius = 2.5
            architecture = ["simple", "resnetb", "resnetb_strided",
                            "resnetb", "nearest_upsample"]

        batch, plan = demo_batch(C(), batch_size=1, seed=0, density=5.0)
        outs = show_batch(batch, out_dir=str(tmp_path / "dbg"))
        plys = [o for o in outs if o.endswith(".ply")]
        htmls = [o for o in outs if o.endswith(".html")]
        assert len(plys) == 2          # one ply+png per pyramid level
        for o in plys:
            assert os.path.exists(o)
            assert os.path.exists(o.replace(".ply", ".png"))
        # Interactive WebGL viewer (the mayavi-window equivalent): one
        # self-contained HTML per sphere, no external assets
        assert len(htmls) == 1 and os.path.exists(htmls[0])
        with open(htmls[0]) as f:
            head = f.read(4096)
        assert "<html" in head.lower()


class TestStepTimer:

    def test_phases(self, monkeypatch):
        # Deterministic fake clock: real sleeps flake under CPU contention
        # (single-core CI host).
        import weasal_tpu.utils.profiling as prof
        clock = {"t": 0.0}
        monkeypatch.setattr(prof.time, "perf_counter", lambda: clock["t"])
        timer = StepTimer(["a", "b"])
        for _ in range(3):
            with timer.phase("a"):
                clock["t"] += 0.001
            with timer.phase("b"):
                clock["t"] += 0.002
        assert timer.ema["b"] > timer.ema["a"] > 0
        assert "a=" in timer.summary()


class TestStallWatchdog:

    def test_beats_keep_it_alive_and_stall_exits_86(self):
        """Run in a subprocess: the stall path hard-exits via os._exit."""
        import subprocess
        import sys
        code = (
            "import time\n"
            "from weasal_tpu.utils.watchdog import StallWatchdog, "
            "EXIT_STALLED\n"
            "wd = StallWatchdog(timeout_s=0.4, label='t')\n"
            "for _ in range(4):\n"
            "    time.sleep(0.2); wd.beat()\n"   # beats prevent firing
            "print('ALIVE', flush=True)\n"
            "time.sleep(5)\n"                    # now stall -> exit 86
            "print('NEVER', flush=True)\n"
        )
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=120,
                           cwd="/root/repo")
        assert r.returncode == 86, (r.returncode, r.stdout, r.stderr)
        assert "ALIVE" in r.stdout
        assert "NEVER" not in r.stdout
        # The stall diagnostic is a raw os.write to fd 2: print()/stdout
        # would take the interpreter's stdout lock, which the wedged main
        # thread can hold mid-write (observed: blocked the exit 20+ min).
        assert "watchdog" in r.stderr

    def test_disabled_never_fires(self):
        from weasal_tpu.utils.watchdog import StallWatchdog
        wd = StallWatchdog(timeout_s=0)
        assert wd._thread is None
        wd.beat(); wd.stop()


def test_conf_matrix_create_asymmetric_matches_reference():
    """create() with distinct gt/pred label sets reproduces the reference's
    unbalanced matrix (reference utils/conf_matrix.py:17-84)."""
    import sys
    from weasal_tpu.utils.conf_matrix import create

    rng = np.random.default_rng(0)
    labels_gt = [0, 1, 2, 5, 10]
    labels_pr = [0, 1, 2, 5]
    gt = rng.choice(labels_gt, 500)
    pred = rng.choice(labels_pr, 500)

    ours = create(gt, pred, labels_gt, labels_pr)
    assert ours.shape == (5, 4)
    assert ours.sum() == 500

    sys.path.insert(0, "/root/reference")
    try:
        from utils.conf_matrix import create as ref_create
        theirs = ref_create(gt.copy(), pred.copy(), labels_gt, labels_pr)
    finally:
        sys.path.remove("/root/reference")
        for m in [k for k in sys.modules
                  if k == "utils" or k.startswith("utils.")]:
            del sys.modules[m]
    np.testing.assert_array_equal(ours, theirs)

    # symmetric path unchanged
    sym = create(gt, gt, labels_gt)
    assert sym.shape == (5, 5) and np.trace(sym) == 500


def test_conf_matrix_create_drops_out_of_range_labels():
    """Asymmetric create() must DROP ids outside the declared label sets:
    negative ignore labels (resident buffers pad labels with -1) used to be
    silently counted as the last class via Python negative indexing, and
    ids above max(label_values) raised IndexError."""
    from weasal_tpu.utils.conf_matrix import create

    labels_gt = [0, 1, 2]
    labels_pr = [0, 1]
    gt = np.array([0, 1, 2, -1, 7, 1])
    pred = np.array([0, 1, 1, 0, 0, 9])
    out = create(gt, pred, labels_gt, labels_pr)
    assert out.shape == (3, 2)
    # only the first three pairs are in-range on both sides
    assert out.sum() == 3
    np.testing.assert_array_equal(out, [[1, 0], [0, 1], [0, 1]])


def test_al_override_keeps_label_budget():
    """--al_iterations 0 must not silently grant the full anchor set.

    Regression: the entry scripts used to set subsample_labels =
    (al_iterations > 0), so a no-AL quality run trained on ~40x the
    600-label budget — an invalid comparison vs the reference
    (reference train_Vaihingen3D_WeakLabel.py:180 ties subsampling to the
    config class, not the acquisition count).
    """
    from train_Vaihingen3D_WeakLabel import (Vaihingen3DWLConfig,
                                             apply_al_override)

    config = Vaihingen3DWLConfig()
    assert config.subsample_labels          # class default: budgeted labels
    apply_al_override(config, 0)
    assert config.subsample_labels
    assert config.active_learning_iterations == 0
    apply_al_override(config, 2)
    assert config.subsample_labels
    assert config.active_learning_iterations == 2

    # full-supervision configs keep their explicit False under AL=0
    config.subsample_labels = False
    apply_al_override(config, 0)
    assert not config.subsample_labels
