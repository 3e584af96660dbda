import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep
from sqair_tpu.training import (
    init_train,
    latest_checkpoint,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)

B, T, S, HW, NWHAT, NH = 4, 2, 2, 16, 4, 16


def tiny_model(k=2):
    timestep = SQAIRTimestep(
        n_steps=S, img_size=(HW, HW), glimpse_size=(6, 6), n_what=NWHAT,
        n_hidden=NH, steps_pred_hidden=[8],
    )
    decoder = AIRDecoder(
        img_size=(HW, HW), glimpse_size=(6, 6), glimpse_n_hiddens=[NH],
        mean_img=np.zeros((HW, HW), np.float32),
    )
    return Model(SequentialAIR(timestep, decoder), k_particles=k)


class TestSchedules:
    def test_piecewise_constant(self):
        sched = make_lr_schedule(1e-5, "4,6,10", 2_000_000)
        assert float(sched(0)) == pytest.approx(1e-5)
        # cumsum(4,6,10)=(4,10,20) -> boundaries at 400k and 1M of 2M iters
        assert float(sched(399_999)) == pytest.approx(1e-5)
        assert float(sched(400_001)) == pytest.approx(1e-5 / 3)
        assert float(sched(1_000_001)) == pytest.approx(1e-5 / 9)
        assert float(sched(1_999_999)) == pytest.approx(1e-5 / 9)

    def test_no_schedule(self):
        assert make_lr_schedule(1e-4, "", 100) == 1e-4

    def test_optimizers_construct(self):
        for name in ("rmsprop", "adam", "sgd", "momentum"):
            make_optimizer(name, 1e-4)
        with pytest.raises(ValueError):
            make_optimizer("lbfgs", 1e-4)


class TestTrainStep:
    def test_loss_decreases_on_fixed_batch(self):
        model = tiny_model()
        opt = make_optimizer("adam", 3e-4)
        rng = jax.random.PRNGKey(0)
        obs = jax.random.uniform(jax.random.PRNGKey(1), (T, B, HW, HW)) * 0.3
        nums = jnp.concatenate([jnp.ones((T, B, 1)), jnp.zeros((T, B, S))], -1)

        state = init_train(model, opt, rng, obs)
        step = make_train_step(model, opt, donate=False)

        losses = []
        params, opt_state = state.params, state.opt_state
        for i in range(30):
            params, opt_state, metrics = step(
                params, opt_state, jax.random.fold_in(rng, i), obs, nums
            )
            losses.append(float(metrics["target"]))

        assert np.isfinite(losses).all()
        # moving average decreases
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses

    def test_eval_step(self):
        model = tiny_model()
        opt = make_optimizer("adam", 1e-4)
        rng = jax.random.PRNGKey(0)
        obs = jax.random.uniform(jax.random.PRNGKey(1), (T, B, HW, HW))
        nums = jnp.concatenate([jnp.ones((T, B, 1)), jnp.zeros((T, B, S))], -1)
        state = init_train(model, opt, rng, obs)
        ev = make_eval_step(model)
        metrics = ev(state.params, rng, obs, nums)
        assert np.isfinite(float(metrics["iwae"]))


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        model = tiny_model()
        opt = make_optimizer("adam", 1e-4)
        rng = jax.random.PRNGKey(0)
        obs = jax.random.uniform(jax.random.PRNGKey(1), (T, B, HW, HW))
        state = init_train(model, opt, rng, obs)

        d = str(tmp_path / "run")
        save_checkpoint(d, 123, state.as_dict())
        found = latest_checkpoint(d)
        assert found is not None and found[0] == 123

        restored = restore_checkpoint(found[1], state.as_dict())
        orig = jax.tree_util.tree_leaves(state.params)
        back = jax.tree_util.tree_leaves(restored["params"])
        for a, b in zip(orig, back):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored["step"]) == 0


class TestGradDiagnostics:
    def test_make_grad_fn_and_named_leaves(self):
        from sqair_tpu.training import make_grad_fn, named_grad_leaves

        model = tiny_model()
        rng = jax.random.PRNGKey(0)
        obs = jax.random.uniform(jax.random.PRNGKey(1), (T, B, HW, HW))
        nums = np.zeros((T, B, S + 1), np.float32)
        nums[:, :, 0] = 1.0
        params = model.init(rng, obs)

        grads = make_grad_fn(model)(params, rng, obs, jnp.asarray(nums))
        named = dict(named_grad_leaves(grads))
        # one entry per parameter leaf, dotted-path tags, finite values
        assert len(named) == len(jax.tree_util.tree_leaves(grads))
        assert all("." in k for k in named)
        for k, v in named.items():
            assert np.all(np.isfinite(np.asarray(v))), k


class TestMetricWriterSinks:
    def test_histogram_and_image_sinks(self, tmp_path):
        from sqair_tpu.eval_tools import MetricWriter

        w = MetricWriter(str(tmp_path / "logs"))
        w.write_histogram(1, "grads/test", np.random.randn(3, 4))
        w.write_image(1, "render/obs", np.random.rand(16, 48))       # HW
        w.write_image(1, "render/rgb", np.random.rand(16, 48, 3))    # HWC
        w.write(1, {"target": 1.0})
        w.close()
        # tensorboardX event file materialised (if tb available) + jsonl
        assert (tmp_path / "logs" / "metrics.jsonl").exists()
