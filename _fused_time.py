import functools, time, sys
import numpy as np, jax, jax.numpy as jnp
from vslam_tpu.config import VSLAMConfig
from vslam_tpu.datasets import synthetic
from vslam_tpu.mapping import point_map
from vslam_tpu.pipeline import tracker

cfg = VSLAMConfig()
K = cfg.camera.K(); W, H = cfg.camera.width, cfg.camera.height
scene = synthetic.make_scene(num_points=12000, seed=5, extent=(80,15,160), z_min=5.0)
poses = synthetic.make_trajectory(17, step=1.0, seed=5)
fr = synthetic.render_sequence(K, poses, scene, W, H)
state = tracker.bootstrap(jnp.asarray(fr[0]), cfg)
kk = jax.random.split(jax.random.PRNGKey(11), 2)
xyz = jax.random.normal(kk[0], (51200,3)) * jnp.asarray([20.,8.,60.])
desc = jax.random.bits(kk[1], (51200,8), jnp.uint32)
m = point_map.insert_points(state.map, xyz, jnp.zeros((51200,3),jnp.float32), desc,
                            jnp.ones((51200,),bool), frame_idx=1<<20)
state = state.replace(map=m)
stacked = jnp.asarray(np.stack(fr[1:]))
np.asarray(state.map.size)

@functools.partial(jax.jit, static_argnames=("n",))
def run_n(st, i0, n):
    def body(s, i):
        s2, out = tracker.track_step(s, stacked[i], cfg)
        return s2, out.num_inliers
    st, inl = jax.lax.scan(body, st, i0 + jnp.arange(n))
    return st, inl.sum()

def timed(n, rep):
    s = state.replace(key=jax.random.fold_in(state.key, rep))
    np.asarray(s.key)
    t0 = time.perf_counter()
    _, x = run_n(s, jnp.int32(0), n); np.asarray(x)
    return time.perf_counter() - t0

np.asarray(run_n(state, jnp.int32(0), 8)[1]); np.asarray(run_n(state, jnp.int32(0), 16)[1])
th = min(timed(8, r) for r in (1,2,3)); tf = min(timed(16, r) for r in (4,5,6))
ms = (tf - th) / 8 * 1000
print(f"fused step: {ms:.2f} ms/frame = {1000/ms:.1f} fps (t8={th:.3f} t16={tf:.3f})")
