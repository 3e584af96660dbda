import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep
from sqair_tpu.training import init_train, make_optimizer, make_train_step
T,B,K,S,H,G,NWHAT,NH = 10,32,5,3,50,20,50,256
timestep = SQAIRTimestep(n_steps=S, img_size=(H,H), glimpse_size=(G,G), n_what=NWHAT, n_hidden=NH, steps_pred_hidden=[NH//2])
decoder = AIRDecoder(img_size=(H,H), glimpse_size=(G,G), glimpse_n_hiddens=[NH,NH], mean_img=np.zeros((H,H),np.float32))
import sys as _sys
_remat = _sys.argv[1] if len(_sys.argv) > 1 else "dots"
_unroll = int(_sys.argv[2]) if len(_sys.argv) > 2 else 1
print("remat:", _remat, "unroll:", _unroll)
model = Model(SequentialAIR(timestep, decoder, remat=_remat, scan_unroll=_unroll), k_particles=K)
optimizer = make_optimizer("rmsprop",1e-5)
rng = jax.random.PRNGKey(0)
obs = jax.random.uniform(jax.random.PRNGKey(1),(T,B,H,H))
nums = jnp.zeros((T,B,S+1))
print("init...", flush=True)
state = init_train(model, optimizer, rng, obs)
step = make_train_step(model, optimizer, donate=False)
params, opt_state = state.params, state.opt_state
t0=time.perf_counter()
for i in range(3):
    params, opt_state, m = step(params, opt_state, jax.random.fold_in(rng,1000+i), obs, nums)
print("warm target: %.2f (compile %.0fs)" % (float(m["target"]), time.perf_counter()-t0), flush=True)
for trial in range(3):
    t0=time.perf_counter(); N=20
    for i in range(N):
        params, opt_state, m = step(params, opt_state, jax.random.fold_in(rng,2000+trial*N+i), obs, nums)
    v=float(m["target"])
    dt=(time.perf_counter()-t0)/N
    print("trial %d: %.2f ms/step -> %.0f frames/s (target=%.1f)" % (trial, dt*1e3, T*B/dt, v), flush=True)
