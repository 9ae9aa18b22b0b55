import sys, time, os
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
DEPTH = int(os.environ.get("D3DP_BENCH_DEPTH", "8"))
FUSE = int(os.environ.get("D3DP_BENCH_FUSE", "4"))
from d3dp_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from d3dp_tpu.diffusion import D3DP, D3DPConfig
from d3dp_tpu.models import MixSTEConfig

ROWS, F, J = 40, 243, 17
d3dp = D3DP(D3DPConfig(
    model=MixSTEConfig(num_frames=F, embed_dim=512, depth=DEPTH,
                       dtype=jnp.bfloat16, attention_impl="pallas",
                       fuse_level=FUSE),
    num_proposals=1, sampling_timesteps=1))
params = d3dp.init_params(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
x2d = jnp.asarray(rng.randn(ROWS,F,J,2)*0.3, jnp.float32)
x3d = jnp.asarray(rng.randn(ROWS,F,J,3)*0.3, jnp.float32)
t = jnp.zeros((ROWS,), jnp.int32)

N_IT = 20
@jax.jit
def many(p, x3d):
    def body(i, x):
        out = d3dp.model.apply(p, x2d, x, t, deterministic=True)
        # feed output back (prevents DCE, keeps shapes)
        return x * 0.999 + out * 0.001
    return jax.lax.fori_loop(0, N_IT, body, x3d)

t0=time.time()
out = many(params, x3d); out.block_until_ready()
compile_s = time.time()-t0
t0=time.time()
out = many(params, x3d)
_ = float(jnp.sum(out))
per_fwd = (time.time()-t0)/N_IT*1000
cfg = {k:v for k,v in os.environ.items() if k.startswith("D3DP")}
print(f"{cfg} fwd: {per_fwd:.1f} ms (compile {compile_s:.0f}s)")
