"""Fused per-frame SSM kernels (ops/fused_cells.py).

Three layers of validation, all on CPU:
  1. the jnp reference functions match the flax module path exactly
     (noise backed out of the flax outputs and replayed);
  2. the Pallas kernels (interpret mode) match the jnp references forward;
  3. the hand-derived backward kernels match jax.grad of the references
     for every input and parameter.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sqair_tpu.ops.fused_cells as fc

# heavy (interpret-mode Pallas / full variant matrix): slow tier
pytestmark = pytest.mark.slow
from sqair_tpu.models import SQAIRTimestep
from sqair_tpu.ops.distributions import fill_triangular

B, S, HH, GG, NW, U, SP, WB, MH = 4, 3, 16, 6, 5, 16, 8, 12, 10


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fc, "_INTERPRET", True)


def _W(rng, m, n, s=0.4):
    return jnp.asarray(rng.randn(m, n).astype(np.float32) * s / np.sqrt(m))


def _b(rng, n, v=0.0):
    return jnp.full((n,), v, jnp.float32) + jnp.asarray(
        rng.randn(n).astype(np.float32) * 0.01
    )


def _disc_params(rng):
    return fc.DiscParams(
        enc_in=((_W(rng, HH * HH, U), _b(rng, U)), (_W(rng, U, U), _b(rng, U))),
        rnn=(_W(rng, U + U + NW + 4 + 1, U), _W(rng, U, U), _b(rng, U)),
        stp=((_W(rng, U, U), _b(rng, U)), (_W(rng, U, U), _b(rng, U)),
             (_W(rng, U, 8), _b(rng, 8))),
        stp_offset=jnp.asarray(-1.5),
        ge_enc=((_W(rng, GG * GG, U), _b(rng, U)), (_W(rng, U, U), _b(rng, U))),
        ge_head=(_W(rng, U, 2 * NW), _b(rng, 2 * NW)),
        sp=((_W(rng, U + NW, SP), _b(rng, SP)), (_W(rng, SP, 1), _b(rng, 1, 1.0))),
    )


def _prop_params(rng):
    return fc.PropParams(
        wb=((_W(rng, U, WB), _b(rng, WB)), (_W(rng, WB, 4), _b(rng, 4))),
        mask=((_W(rng, U, MH), _b(rng, MH)),
              (_W(rng, MH, GG * GG), _b(rng, GG * GG, 1.0))),
        ge_enc=((_W(rng, GG * GG, U), _b(rng, U)), (_W(rng, U, U), _b(rng, U))),
        ge_head=(_W(rng, U, 2 * NW), _b(rng, 2 * NW)),
        rnn=(_W(rng, 2 * NW + 4 + 1 + NW + 4 + 1 + U, U), _W(rng, U, U),
             _b(rng, U)),
        stp=((_W(rng, U + 4 + U, U), _b(rng, U)), (_W(rng, U, U), _b(rng, U)),
             (_W(rng, U, 8), _b(rng, 8))),
        stp_offset=jnp.asarray(-1.5),
        tril=jnp.tril(jnp.asarray(rng.randn(4, 4).astype(np.float32) * 0.2)),
        gru=(_W(rng, U + 4 + 2 * NW, 2 * U), _W(rng, U, 2 * U), _b(rng, 2 * U),
             _W(rng, U + 4 + 2 * NW, U), _W(rng, U, U), _b(rng, U)),
        td=(_W(rng, U, 2 * NW), _b(rng, 2 * NW)),
        gates=(_W(rng, U, 3 * NW), _b(rng, 3 * NW, 1.0)),
        sp=((_W(rng, U + U + NW, SP), _b(rng, SP)),
            (_W(rng, SP, 1), _b(rng, 1, 5.0))),
    )


def _assert_close(a, b, tol, what):
    d = float(jnp.max(jnp.abs(a - b)))
    scale = float(jnp.max(jnp.abs(a))) + 1e-8
    assert d < tol or d / scale < tol, f"{what}: maxabs={d:.3e} rel={d/scale:.3e}"


class TestDiscKernel:
    def _inputs(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(B, HH, HH).astype(np.float32))
        cond = jnp.asarray(rng.randn(B, U).astype(np.float32) * 0.3)
        h0 = jnp.asarray(rng.randn(1, U).astype(np.float32) * 0.1)
        eps_w = jnp.asarray(rng.randn(S, B, 4).astype(np.float32))
        eps_x = jnp.asarray(rng.randn(S, B, NW).astype(np.float32))
        u = jnp.asarray(rng.rand(S, B, 1).astype(np.float32))
        return img, cond, h0, eps_w, eps_x, u, _disc_params(rng)

    def test_forward_and_grads_match_reference(self):
        img, cond, h0, eps_w, eps_x, u, p = self._inputs()
        imgf = img.reshape(B, -1)

        def run_ref(cond, h0, p):
            return fc.disc_ssm_ref(img, imgf, cond, jnp.broadcast_to(h0, (B, U)),
                                   eps_w, eps_x, u, p, (GG, GG))

        def run_fused(cond, h0, p):
            return fc.fused_disc_ssm(img, imgf, cond, h0, eps_w, eps_x, u,
                                     p, (GG, GG))

        ref, fus = run_ref(cond, h0, p), run_fused(cond, h0, p)
        assert float(jnp.sum(ref["presence"])) > 0  # non-degenerate case
        for k in fc.DISC_OUT_FIELDS:
            _assert_close(ref[k], fus[k], 1e-4, f"fwd {k}")

        rng = np.random.RandomState(7)
        cots = {k: jnp.asarray(rng.randn(*ref[k].shape).astype(np.float32))
                for k in fc.DISC_OUT_FIELDS}

        def loss(fn):
            return lambda *a: sum(
                jnp.sum(fn(*a)[k] * cots[k]) for k in fc.DISC_OUT_FIELDS
            )

        gr = jax.grad(loss(run_ref), argnums=(0, 1, 2))(cond, h0, p)
        gf = jax.grad(loss(run_fused), argnums=(0, 1, 2))(cond, h0, p)
        for (kp, a), b in zip(jax.tree_util.tree_flatten_with_path(gr)[0],
                              jax.tree_util.tree_flatten(gf)[0]):
            _assert_close(a, b, 2e-3, f"grad {jax.tree_util.keystr(kp)}")


class TestPropKernel:
    def _inputs(self):
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(B, HH, HH).astype(np.float32))
        z3 = (jnp.asarray(rng.randn(S, B, NW).astype(np.float32) * 0.5),
              jnp.asarray(rng.randn(S, B, 4).astype(np.float32) * 0.5),
              jnp.asarray((rng.rand(S, B, 1) < 0.7).astype(np.float32)))
        th = jnp.asarray(rng.randn(S, B, U).astype(np.float32) * 0.3)
        h0 = jnp.asarray(rng.randn(1, U).astype(np.float32) * 0.1)
        eps_w = jnp.asarray(rng.randn(S, B, 4).astype(np.float32))
        eps_x = jnp.asarray(rng.randn(S, B, NW).astype(np.float32))
        u = jnp.asarray(rng.rand(S, B, 1).astype(np.float32))
        return img, z3, th, h0, eps_w, eps_x, u, _prop_params(rng)

    def test_forward_and_grads_match_reference(self):
        img, z3, th, h0, eps_w, eps_x, u, p = self._inputs()
        plogit = jnp.zeros((S, B, 1), jnp.float32)
        fields = list(fc.PROP_OUT_FIELDS) + ["temporal_h"]

        def run_ref(z3, th, h0, p):
            return fc.prop_ssm_ref(img, z3 + (plogit,), th,
                                   jnp.broadcast_to(h0, (B, U)),
                                   eps_w, eps_x, u, p, (GG, GG))

        def run_fused(z3, th, h0, p):
            return fc.fused_prop_ssm(img, z3 + (plogit,), th, h0,
                                     eps_w, eps_x, u, p, (GG, GG))

        ref, fus = run_ref(z3, th, h0, p), run_fused(z3, th, h0, p)
        assert float(jnp.sum(ref["presence"])) > 0
        for k in fields:
            _assert_close(ref[k], fus[k], 2e-4, f"fwd {k}")

        rng = np.random.RandomState(8)
        cots = {k: jnp.asarray(rng.randn(*ref[k].shape).astype(np.float32))
                for k in fields}

        def loss(fn):
            return lambda *a: sum(jnp.sum(fn(*a)[k] * cots[k]) for k in fields)

        gr = jax.grad(loss(run_ref), argnums=(0, 1, 2, 3))(z3, th, h0, p)
        gf = jax.grad(loss(run_fused), argnums=(0, 1, 2, 3))(z3, th, h0, p)
        for (kp, a), b in zip(jax.tree_util.tree_flatten_with_path(gr)[0],
                              jax.tree_util.tree_flatten(gf)[0]):
            _assert_close(a, b, 2e-3, f"grad {jax.tree_util.keystr(kp)}")


class TestReferenceMatchesFlax:
    """The jnp reference functions reproduce the flax module math exactly
    (noise backed out of flax outputs and replayed through the reference)."""

    @pytest.fixture(scope="class")
    def setup(self):
        ts = SQAIRTimestep(n_steps=S, img_size=(HH, HH), glimpse_size=(GG, GG),
                           n_what=NW, n_hidden=U, steps_pred_hidden=[SP])
        rs = np.random.RandomState(3)
        img = jnp.asarray(rs.rand(B, HH, HH).astype(np.float32))

        def init_step(m, rng_, im):
            c = m.initial_carry(im.shape[0])
            return m(rng_, im, c["z"], c["time_state"], c["prior_state"],
                     c["last_used_id"], c["prev_ids"], 0, False, None)

        params = ts.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1), img,
                         method=init_step)
        return ts, params, img, rs

    def test_disc_reference_matches_flax(self, setup):
        ts, params, img, _ = setup
        cond = jnp.asarray(
            np.random.RandomState(5).randn(B, U).astype(np.float32) * 0.3)

        out, _ = ts.apply(params, jax.random.PRNGKey(7), img, cond,
                          method=lambda m, r, i, c: m.discover._discover(r, i, c))

        p = params["params"]
        dcell = p["discover"]["cell"]
        ge = p["_glimpse_encoder"]
        dp = fc.DiscParams(
            enc_in=((p["_input_encoder"]["MLP_0"]["w_0"],
                     p["_input_encoder"]["MLP_0"]["b_0"]),
                    (p["_input_encoder"]["MLP_0"]["w_1"],
                     p["_input_encoder"]["MLP_0"]["b_1"])),
            rnn=(dcell["transition"]["in_to_hidden_w"],
                 dcell["transition"]["hidden_to_hidden_w"],
                 dcell["transition"]["in_to_hidden_b"]),
            stp=tuple((dcell["transform_estimator"]["MLP_0"][f"w_{i}"],
                       dcell["transform_estimator"]["MLP_0"][f"b_{i}"])
                      for i in range(3)),
            stp_offset=dcell["transform_estimator"]["scale_offset"],
            ge_enc=tuple((ge["glimpse_encoder"]["MLP_0"][f"w_{i}"],
                          ge["glimpse_encoder"]["MLP_0"][f"b_{i}"])
                         for i in range(2)),
            ge_head=(ge["_what_distrib"]["Dense_0"]["kernel"],
                     ge["_what_distrib"]["Dense_0"]["bias"]),
            sp=tuple((dcell["steps_predictor"]["MLP_0"][f"w_{i}"],
                      dcell["steps_predictor"]["MLP_0"][f"b_{i}"])
                     for i in range(2)),
        )
        T_ = lambda x: jnp.swapaxes(x, 0, 1)
        eps_w = T_((out["where"] - out["where_loc"]) / out["where_scale"])
        eps_x = T_((out["what"] - out["what_loc"]) / out["what_scale"])
        pres, prob = T_(out["presence"]), T_(out["presence_prob"])
        pres_prev = jnp.concatenate([jnp.ones((1, B, 1)), pres[:-1]], 0)
        psamp = jnp.where(pres_prev > 0, pres, 0.0)
        u = jnp.where(psamp > 0, prob * 0.5, (prob + 1.0) * 0.5)

        ref = fc.disc_ssm_ref(
            img, img.reshape(B, -1), cond,
            jnp.broadcast_to(dcell["transition"]["h0"], (B, U)),
            eps_w, eps_x, u, dp, (GG, GG))
        for k in fc.DISC_OUT_FIELDS:
            _assert_close(T_(out[k]), ref[k], 5e-5, f"flax {k}")

    def test_prop_reference_matches_flax(self, setup):
        ts, params, img, rs = setup
        what_tm1 = jnp.asarray(rs.randn(B, S, NW).astype(np.float32) * 0.5)
        where_tm1 = jnp.asarray(rs.randn(B, S, 4).astype(np.float32) * 0.5)
        pres_tm1 = jnp.asarray((rs.rand(B, S, 1) < 0.7).astype(np.float32))
        plogit_tm1 = jnp.zeros((B, S, 1), jnp.float32)
        z = (what_tm1, where_tm1, pres_tm1, plogit_tm1)
        th_b = jnp.asarray(rs.randn(B, S, U).astype(np.float32) * 0.3)

        stacked, _, dwhat, _, tnew = ts.apply(
            params, jax.random.PRNGKey(11), img, z, (th_b,),
            method=lambda m, r, i, z_, t_: m.propagate._ssm(r, i, z_, t_))

        p = params["params"]
        cell = p["propagate"]["ssm_cell"]
        ge = p["_glimpse_encoder"]
        pp = fc.PropParams(
            wb=tuple((cell["_where_bias_mlp"][f"w_{i}"],
                      cell["_where_bias_mlp"][f"b_{i}"]) for i in range(2)),
            mask=tuple((ge["_mask_mlp"][f"w_{i}"], ge["_mask_mlp"][f"b_{i}"])
                       for i in range(2)),
            ge_enc=tuple((ge["glimpse_encoder"]["MLP_0"][f"w_{i}"],
                          ge["glimpse_encoder"]["MLP_0"][f"b_{i}"])
                         for i in range(2)),
            ge_head=(ge["_what_distrib"]["Dense_0"]["kernel"],
                     ge["_what_distrib"]["Dense_0"]["bias"]),
            rnn=(cell["transition"]["in_to_hidden_w"],
                 cell["transition"]["hidden_to_hidden_w"],
                 cell["transition"]["in_to_hidden_b"]),
            stp=tuple((cell["transform_estimator"]["MLP_0"][f"w_{i}"],
                       cell["transform_estimator"]["MLP_0"][f"b_{i}"])
                      for i in range(3)),
            stp_offset=cell["transform_estimator"]["scale_offset"],
            tril=fill_triangular(cell["_where_distrib"]["cholesky_scale"][:, 0], 4),
            gru=(p["_temporal_cell"]["gates_xw"], p["_temporal_cell"]["gates_hw"],
                 p["_temporal_cell"]["gates_b"], p["_temporal_cell"]["candidate_xw"],
                 p["_temporal_cell"]["candidate_hw"], p["_temporal_cell"]["candidate_b"]),
            td=(cell["_temporal_what_distrib"]["Dense_0"]["kernel"],
                cell["_temporal_what_distrib"]["Dense_0"]["bias"]),
            gates=(cell["_gates"]["w_0"], cell["_gates"]["b_0"]),
            sp=tuple((cell["steps_predictor"]["MLP_0"][f"w_{i}"],
                      cell["steps_predictor"]["MLP_0"][f"b_{i}"])
                     for i in range(2)),
        )
        T_ = lambda x: jnp.swapaxes(x, 0, 1)
        tril_eye = pp.tril + jnp.eye(4)
        y = T_((stacked["where"] - stacked["where_loc"]) / stacked["where_scale"])
        eps_w = jax.scipy.linalg.solve_triangular(
            jnp.broadcast_to(tril_eye, (S, B, 4, 4)), y[..., None], lower=True
        )[..., 0]
        eps_x = T_((stacked["what"] - stacked["what_loc"]) / stacked["what_scale"])
        pres, prob = T_(stacked["presence"]), T_(stacked["presence_prob"])
        p1 = T_(pres_tm1)
        psamp = jnp.where(p1 > 0, pres, 0.0)
        u = jnp.where(psamp > 0, prob * 0.5, (prob + 1.0) * 0.5)

        ref = fc.prop_ssm_ref(
            img, tuple(T_(a) for a in z), T_(th_b),
            jnp.broadcast_to(cell["transition"]["h0"], (B, U)),
            eps_w, eps_x, u, pp, (GG, GG))
        for k in fc.DISC_OUT_FIELDS:
            _assert_close(T_(stacked[k]), ref[k], 5e-5, f"flax {k}")
        _assert_close(T_(tnew[0]), ref["temporal_h"], 5e-5, "flax temporal_h")
        _assert_close(T_(dwhat), ref["what_sample"], 5e-5, "flax what_sample")
