"""Config-variant + rollout tests (BASELINE configs 4 and 5)."""
import os
import sys

import numpy as np
import pytest


# import every config once so their flags are registered (module caching
# means later imports are no-ops; tests only mutate values)
from sqair_tpu.configs import (  # noqa: E402,F401
    mlp_mnist_model,
    pedestrian_data,
    pedestrian_model,
    small_digit_mnist_model,
    small_digit_seq_mnist_data,
)
from sqair_tpu.experiment import flags  # noqa: E402


@pytest.fixture(autouse=True)
def fresh_flags():
    """Isolate flag VALUES between tests (definitions persist)."""
    saved = dict(flags.FLAGS._values)
    yield
    flags.FLAGS._values.clear()
    flags.FLAGS._values.update(saved)


TINY = ["--n_steps_per_image=2", "--k_particles=2", "--n_units=1", "--n_what=4"]


def _run_rollout(tmp_path, extra):
    from sqair_tpu.scripts import rollout

    argv = TINY + [
        "--rollout_len=4", "--condition_frames=2", "--n_examples=2",
        f"--out_dir={tmp_path}",
    ] + extra
    rollout.main(argv)
    out = np.load(os.path.join(tmp_path, "rollout.npz"))
    return out


class TestSmallDigitStressConfig:
    def test_defaults_retuned(self):
        # several configs tune the shared defaults (synth data sets
        # output_std=0.15); re-apply this variant's shifts as a real run
        # loading only these configs would
        import importlib

        importlib.reload(small_digit_mnist_model)
        assert flags.FLAGS._defs["disc_step_bias"][1] == 2.0
        assert flags.FLAGS._defs["output_std"][1] == 0.1

    def test_cli_overrides_beat_variant_defaults(self):
        flags.set_default("disc_step_bias", 1.0)  # back to base default
        flags.FLAGS.disc_step_bias = 1.0
        flags.FLAGS.parse(["--disc_step_bias=2.5"])
        flags.set_default("disc_step_bias", 0.0)  # variant re-applied
        # explicit user value survives the variant's default shift
        assert flags.FLAGS.disc_step_bias == 2.5

    @pytest.mark.slow
    def test_rollout_small_digits(self, tmp_path):
        out = _run_rollout(str(tmp_path), [
            "--font_train_samples=8", "--font_valid_samples=4",
            "--font_timesteps=3", "--font_bank_size=8",
            "--data_config=sqair_tpu/configs/small_digit_seq_mnist_data.py",
            "--model_config=sqair_tpu/configs/small_digit_mnist_model.py",
        ])
        assert out["canvas"].shape == (4, 2, 50, 50)
        assert np.isfinite(out["canvas"]).all()


class TestPedestrianConfig:
    def test_bank_shapes(self):
        from sqair_tpu.data.pedestrian import make_pedestrian_bank

        bank = make_pedestrian_bank(4, 32, 12, seed=1)
        assert bank.shape == (4, 32, 12)
        assert bank.max() <= 255.0 and bank.min() >= 0.0
        # silhouettes are taller than wide
        for t in bank:
            ys, xs = np.nonzero(t)
            assert np.ptp(ys) > np.ptp(xs)

    @pytest.mark.slow
    def test_rollout_nonsquare(self, tmp_path):
        out = _run_rollout(str(tmp_path), [
            "--ped_train_samples=8", "--ped_valid_samples=4",
            "--ped_timesteps=3", "--ped_canvas=40,30", "--glimpse_hw=16,6",
            "--data_config=sqair_tpu/configs/pedestrian_data.py",
            "--model_config=sqair_tpu/configs/pedestrian_model.py",
        ])
        assert out["canvas"].shape == (4, 2, 40, 30)
        assert np.isfinite(out["canvas"]).all()

    @pytest.mark.slow
    def test_generation_extends_beyond_data(self, tmp_path):
        """Rollout longer than the dataset's T must work (README:30)."""
        out = _run_rollout(str(tmp_path), [
            "--ped_train_samples=8", "--ped_valid_samples=4",
            "--ped_timesteps=3", "--ped_canvas=40,30", "--glimpse_hw=16,6",
            "--rollout_len=9",
            "--data_config=sqair_tpu/configs/pedestrian_data.py",
            "--model_config=sqair_tpu/configs/pedestrian_model.py",
        ])
        assert out["canvas"].shape[0] == 9


class TestConvModelConfig:
    @pytest.mark.slow
    def test_conv_rollout(self, tmp_path):
        out = _run_rollout(str(tmp_path), [
            "--synth_train_samples=8", "--synth_valid_samples=4",
            "--synth_timesteps=3",
            "--data_config=sqair_tpu/configs/synth_seq_mnist_data.py",
            "--model_config=sqair_tpu/configs/conv_mnist_model.py",
        ])
        assert out["canvas"].shape == (4, 2, 50, 50)
        assert np.isfinite(out["canvas"]).all()
