"""Multi-device tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep
from sqair_tpu.parallel import make_mesh, make_parallel_train_step, shard_batch
from sqair_tpu.training import init_train, make_optimizer

B, T, S, HW, NWHAT, NH = 8, 2, 2, 16, 4, 16


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


class TestMesh:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8
        mesh = make_mesh()
        assert mesh.devices.shape == (8,)

    @pytest.mark.slow
    def test_parallel_train_step_runs(self):
        model = tiny_model()
        opt = make_optimizer("adam", 1e-4)
        mesh = make_mesh()

        rng = jax.random.PRNGKey(0)
        obs = jax.random.uniform(jax.random.PRNGKey(1), (T, B, HW, HW))
        nums = jnp.concatenate([jnp.ones((T, B, 1)), jnp.zeros((T, B, S))], -1)

        state = init_train(model, opt, rng, obs)
        step = make_parallel_train_step(model, opt, mesh, donate=False)

        batch = shard_batch({"obs": obs, "nums": nums}, mesh)
        params, opt_state, metrics = step(
            state.params, state.opt_state, rng, batch["obs"], batch["nums"]
        )
        assert np.isfinite(float(metrics["target"]))
        # params replicated across the mesh
        leaf = jax.tree_util.tree_leaves(params)[0]
        assert leaf.sharding.is_fully_replicated

    @pytest.mark.slow
    def test_parallel_matches_serial(self):
        """Same batch, same rng: sharded step == single-device step."""
        model = tiny_model()
        opt = make_optimizer("sgd", 1e-3)
        mesh = make_mesh()
        rng = jax.random.PRNGKey(0)
        obs = jax.random.uniform(jax.random.PRNGKey(1), (T, B, HW, HW))
        nums = jnp.concatenate([jnp.ones((T, B, 1)), jnp.zeros((T, B, S))], -1)
        state = init_train(model, opt, rng, obs)

        from sqair_tpu.training import make_train_step

        serial = make_train_step(model, opt, donate=False)
        p1, _, m1 = serial(state.params, state.opt_state, rng, obs, nums)

        par = make_parallel_train_step(model, opt, mesh, donate=False)
        batch = shard_batch({"obs": obs, "nums": nums}, mesh)
        p2, _, m2 = par(state.params, state.opt_state, rng, batch["obs"], batch["nums"])

        np.testing.assert_allclose(
            float(m1["target"]), float(m2["target"]), rtol=2e-4
        )
        a = jax.tree_util.tree_leaves(p1)[0]
        b = jax.tree_util.tree_leaves(p2)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


class TestMultisliceMesh:
    """2-D (dcn, data) mesh (SURVEY §5.8: DCN axis for multi-slice)."""

    def test_mesh_shape_and_batch_spec(self):
        from sqair_tpu.parallel.mesh import DATA_AXIS, DCN_AXIS, make_multislice_mesh

        mesh = make_multislice_mesh(2)
        assert mesh.devices.shape == (2, 4)
        assert mesh.axis_names == (DCN_AXIS, DATA_AXIS)

        from sqair_tpu.parallel import batch_sharded, shard_batch

        sh = batch_sharded(mesh)
        obs = np.zeros((2, 8, 4, 4), np.float32)
        out = shard_batch({"obs": obs}, mesh)["obs"]
        assert out.sharding.is_equivalent_to(sh, 4)
        # every device holds B/8 examples
        assert out.addressable_shards[0].data.shape == (2, 1, 4, 4)

    def test_rejects_indivisible(self):
        from sqair_tpu.parallel.mesh import make_multislice_mesh

        with pytest.raises(ValueError):
            make_multislice_mesh(3)

    @pytest.mark.slow
    def test_train_step_on_multislice_mesh(self):
        from sqair_tpu.parallel.mesh import make_multislice_mesh

        model = tiny_model()
        opt = make_optimizer("sgd", 1e-3)
        mesh = make_multislice_mesh(2)
        rng = jax.random.PRNGKey(0)
        obs = jax.random.uniform(jax.random.PRNGKey(1), (T, B, HW, HW))
        nums = jnp.concatenate([jnp.ones((T, B, 1)), jnp.zeros((T, B, S))], -1)
        state = init_train(model, opt, rng, obs)

        step = make_parallel_train_step(model, opt, mesh, donate=False)
        batch = shard_batch({"obs": obs, "nums": nums}, mesh)
        params, _, metrics = step(state.params, state.opt_state, rng,
                                  batch["obs"], batch["nums"])
        assert np.isfinite(float(metrics["target"]))
        assert jax.tree_util.tree_leaves(params)[0].sharding.is_fully_replicated
