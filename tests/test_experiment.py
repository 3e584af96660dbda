"""Tests for the flag registry, config loading, and run-dir protocol."""
import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def clean_flags():
    from sqair_tpu.experiment import flags

    yield
    # NB: modules re-register on import; keep the registry alive across tests


class TestFlags:
    def test_define_and_parse(self):
        from sqair_tpu.experiment import flags

        flags.DEFINE_integer("test_int_flag", 3, "")
        flags.DEFINE_string("test_str_flag", "abc", "")
        flags.DEFINE_boolean("test_bool_flag", False, "")
        leftover = flags.FLAGS.parse(
            ["--test_int_flag=7", "--test_bool_flag=true", "--not_a_flag=1"]
        )
        assert flags.FLAGS.test_int_flag == 7
        assert flags.FLAGS.test_str_flag == "abc"
        assert flags.FLAGS.test_bool_flag is True
        assert leftover == ["--not_a_flag=1"]

    def test_attribute_assignment(self):
        from sqair_tpu.experiment import flags

        flags.DEFINE_integer("test_assign_flag", 1, "")
        flags.FLAGS.test_assign_flag = 42
        assert flags.FLAGS.test_assign_flag == 42

    def test_restore_roundtrip(self):
        from sqair_tpu.experiment import flags

        flags.DEFINE_float("test_restore_flag", 0.5, "")
        d = flags.FLAGS.as_dict()
        d["test_restore_flag"] = 0.75
        flags.FLAGS.restore(d)
        assert flags.FLAGS.test_restore_flag == 0.75


class TestConfigLoading:
    def test_model_config_builds(self):
        from sqair_tpu.experiment.experiment_tools import load

        img = np.zeros((3, 2, 50, 50), np.float32)
        model = load(
            "sqair_tpu/configs/mlp_mnist_model.py",
            img=img, num=np.zeros((3, 2, 4), np.float32),
            mean_img=np.zeros((50, 50), np.float32),
        )
        from sqair_tpu.models import Model

        assert isinstance(model, Model)
        assert model.k_particles == 5
        ts = model.sequence.timestep
        assert ts.n_steps == 3 and ts.n_what == 50 and ts.n_hidden == 256
        assert ts.img_size == (50, 50) and ts.glimpse_size == (20, 20)

    def test_synth_data_config(self):
        import sys

        from sqair_tpu.experiment import flags
        from sqair_tpu.experiment.experiment_tools import load

        flags.FLAGS.parse([])
        flags.FLAGS.synth_train_samples = 16
        flags.FLAGS.synth_valid_samples = 8
        flags.FLAGS.synth_timesteps = 3
        data = load("sqair_tpu/configs/synth_seq_mnist_data.py", 4)
        assert data["train_data"]["imgs"].shape[0] == 3
        batch = next(data["train_iter"])
        assert batch["imgs"].shape[:2] == (3, 4)
        assert batch["nums"].shape == (3, 4, 3)


class TestRunDirs:
    def test_init_checkpoint_creates_numbered_dirs(self, tmp_path, monkeypatch):
        import sys

        from sqair_tpu.experiment.experiment_tools import init_checkpoint

        # init_checkpoint asserts every --flag in sys.argv was consumed;
        # pytest's own options (e.g. --durations=N) must not leak in
        monkeypatch.setattr(sys, "argv", [sys.argv[0]])
        base = str(tmp_path / "run")
        d1, flags1, resume1 = init_checkpoint(
            base, "sqair_tpu/configs/synth_seq_mnist_data.py",
            "sqair_tpu/configs/mlp_mnist_model.py", resume=False,
        )
        assert d1.endswith("/1") and resume1 is None
        assert os.path.exists(os.path.join(d1, "flags.json"))
        assert os.path.exists(os.path.join(d1, "mlp_mnist_model.py"))

        d2, _, _ = init_checkpoint(
            base, "sqair_tpu/configs/synth_seq_mnist_data.py",
            "sqair_tpu/configs/mlp_mnist_model.py", resume=False,
        )
        assert d2.endswith("/2")

        # resume finds dir 2 again
        d3, flags3, _ = init_checkpoint(
            base, "sqair_tpu/configs/synth_seq_mnist_data.py",
            "sqair_tpu/configs/mlp_mnist_model.py", resume=True,
        )
        assert d3 == d2

    def test_resume_without_dir_raises(self, tmp_path):
        from sqair_tpu.experiment.experiment_tools import init_checkpoint

        with pytest.raises(ValueError):
            init_checkpoint(str(tmp_path / "nope"), "a", "b", resume=True)

    def test_attach_joins_latest_without_writing(self, tmp_path, monkeypatch):
        """attach=True (multi-host non-zero processes) must join the
        newest numbered run dir, not create run dir n+1."""
        import sys

        from sqair_tpu.experiment.experiment_tools import init_checkpoint

        monkeypatch.setattr(sys, "argv", [sys.argv[0]])
        base = str(tmp_path / "run")
        d1, _, _ = init_checkpoint(
            base, "sqair_tpu/configs/synth_seq_mnist_data.py",
            "sqair_tpu/configs/mlp_mnist_model.py", resume=False,
        )
        before = sorted(os.listdir(base))

        d_att, flags_att, resume_att = init_checkpoint(
            base, "sqair_tpu/configs/synth_seq_mnist_data.py",
            "sqair_tpu/configs/mlp_mnist_model.py", resume=False, attach=True,
        )
        assert d_att == d1 and resume_att is None
        assert sorted(os.listdir(base)) == before  # nothing new created

    def test_attach_without_dir_raises(self, tmp_path):
        from sqair_tpu.experiment.experiment_tools import init_checkpoint

        os.makedirs(str(tmp_path / "empty"))
        with pytest.raises(ValueError):
            init_checkpoint(str(tmp_path / "empty"), "a", "b",
                            resume=False, attach=True)


def test_resume_cli_flags_override_snapshot(tmp_path):
    """A resumed run must honour explicit CLI flags (e.g. extended
    --train_itr), not be pinned to the flags.json snapshot."""
    import sys

    from sqair_tpu.experiment import flags as tf_flags
    from sqair_tpu.experiment.experiment_tools import init_checkpoint
    import sqair_tpu.scripts.experiment  # noqa: F401  (defines train_itr)

    saved_argv = sys.argv
    saved_vals = dict(tf_flags.FLAGS._values)
    try:
        data_cfg = "sqair_tpu/configs/synth_seq_mnist_data.py"
        model_cfg = "sqair_tpu/configs/mlp_mnist_model.py"
        sys.argv = ["x", "--train_itr=100"]
        logdir, flag_dict, _ = init_checkpoint(str(tmp_path / "run"), data_cfg,
                                               model_cfg, resume=False)
        assert flag_dict["train_itr"] == 100

        sys.argv = ["x", "--train_itr=200"]
        logdir2, flag_dict2, _ = init_checkpoint(str(tmp_path / "run"), data_cfg,
                                                 model_cfg, resume=True)
        assert logdir2 == logdir
        assert flag_dict2["train_itr"] == 200  # CLI beats snapshot
        # snapshot values without CLI overrides survive
        assert flag_dict2["batch_size"] == flag_dict["batch_size"]
        # the merged flags are persisted, so a later eval/rollout on this
        # run dir sees the override instead of the stale snapshot
        from sqair_tpu.experiment.experiment_tools import FLAG_FILE, json_load
        on_disk = json_load(os.path.join(logdir2, FLAG_FILE))
        assert on_disk["train_itr"] == 200
    finally:
        sys.argv = saved_argv
        tf_flags.FLAGS._values.clear()
        tf_flags.FLAGS._values.update(saved_vals)
