import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from differt2d_tpu.scene import Scene
from differt2d_tpu.rt import path_candidate_matrices
from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel
from differt2d_tpu.tracer import scene_arrays
from bench import chained_map_time

scene = Scene.basic_scene()
n = 1024
X, Y = jnp.meshgrid(jnp.linspace(0.01, 0.99, n), jnp.linspace(0.012, 0.988, n))
pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
arrays = scene_arrays(scene)
cands = path_candidate_matrices(arrays.num_objects, 0, 1)
scalars = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
tx = scene.transmitters["tx"].xy

for br in (8, 16, 32, 64, 128):
    kernel = jax.jit(build_power_map_kernel(
        np.asarray(arrays.walls), np.asarray(arrays.kind), cands,
        approx=True, interpret=False, block_rows=br))
    t = chained_map_time(lambda p: kernel(p, tx, arrays.phi, scalars),
                         pixels, k=32, reps=3)
    print(f"block_rows={br}: {t*1e3:.3f} ms/map -> {pixels.shape[0]/t/1e9:.3f} B pts/s", flush=True)
