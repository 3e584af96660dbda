"""Microbenchmark: fused frame kernels vs the unfused flax slot loop.

Times, at the paper config (B*k=160, S=3, 50x50 img, 20x20 glimpse):
  - fused_disc_ssm / fused_prop_ssm forward
  - their backward (via jax.grad of a scalarised loss)
  - the flax Discover._discover / Propagate._ssm equivalents

Run on the TPU: python tools/bench_fused_cells.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, S, H, G, NW, U, SP = 160, 3, 50, 20, 50, 256, 128


def timeit(name, fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    from sqair_tpu.models import SQAIRTimestep
    import sqair_tpu.ops.fused_cells as fc

    ts = SQAIRTimestep(n_steps=S, img_size=(H, H), glimpse_size=(G, G),
                       n_what=NW, n_hidden=U, steps_pred_hidden=[SP])
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(B, H, H).astype(np.float32))

    def init_step(m, rng_, im):
        c = m.initial_carry(im.shape[0])
        return m(rng_, im, c["z"], c["time_state"], c["prior_state"],
                 c["last_used_id"], c["prev_ids"], 0, False, None)

    params = jax.jit(
        lambda r, sr, im: ts.init(r, sr, im, method=init_step)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), img)

    cond = jnp.asarray(rs.randn(B, U).astype(np.float32) * 0.3)
    z = (jnp.asarray(rs.randn(B, S, NW).astype(np.float32) * 0.5),
         jnp.asarray(rs.randn(B, S, 4).astype(np.float32) * 0.5),
         jnp.asarray((rs.rand(B, S, 1) < 0.7).astype(np.float32)),
         jnp.zeros((B, S, 1), jnp.float32))
    th = (jnp.asarray(rs.randn(B, S, U).astype(np.float32) * 0.3),)
    rng = jax.random.PRNGKey(5)

    REPS = 20

    def disc(p, r, c):
        return ts.apply(p, r, img, c,
                        method=lambda m, r_, i, c_: m.discover._discover(r_, i, c_))

    def prop(p, r, c):
        # thread the dependency through the temporal state
        th_c = (th[0] + 0.0 * c[:, None, :],)
        return ts.apply(p, r, img, z, th_c,
                        method=lambda m, r_, i, z_, t_: m.propagate._ssm(r_, i, z_, t_))

    def disc_loss(p, r, c):
        out, n = disc(p, r, c)
        return sum(jnp.sum(v) for v in out.values()) + jnp.sum(n)

    def prop_loss(p, r, c):
        st, n, dw, dwh, t_ = prop(p, r, c)
        return (sum(jnp.sum(v) for v in st.values()) + jnp.sum(n)
                + jnp.sum(dw) + jnp.sum(t_[0]))

    def chained(fn, reduce_out):
        """Runs REPS sequentially-dependent reps inside one jit."""
        def body(c, r):
            out = fn(params, r, c)
            return c + 1e-20 * reduce_out(out), ()

        def run(c0):
            c, _ = jax.lax.scan(body, c0, jax.random.split(rng, REPS))
            return c

        return jax.jit(run)

    sum_all = lambda out: sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(out))

    for fused in (True, False):
        os.environ.pop("SQAIR_NO_FUSE_CELLS", None)
        if not fused:
            os.environ["SQAIR_NO_FUSE_CELLS"] = "1"
        tag = "fused" if fused else "flax "
        c0 = cond
        for name, fn in (("disc fwd", disc),
                         ("disc grad", lambda p, r, c: jax.grad(disc_loss, 2)(p, r, c)),
                         ("prop fwd", prop),
                         ("prop grad", lambda p, r, c: jax.grad(prop_loss, 2)(p, r, c))):
            if "grad" in name and "disc" in name:
                red = lambda g: jnp.sum(g)
            elif "grad" in name:
                red = lambda g: jnp.sum(g)
            else:
                red = sum_all
            dt = timeit(f"{name:10s} ({tag}) x{REPS}", chained(fn, red), c0,
                        iters=10)
            print(f"{'':14s} -> per call {dt / REPS * 1e3:9.3f} ms")


if __name__ == "__main__":
    main()
