import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
n = 8192
a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
@jax.jit
def mm(a, b):
    x = a
    for _ in range(64):
        x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
    return jnp.float32(x[0, 0])
_ = float(mm(a, b))
ts = []
for _ in range(4):
    t0 = time.perf_counter(); _ = float(mm(a, b)); ts.append(time.perf_counter() - t0)
t = min(ts)
fl = 64 * 2 * n**3
print(f"64-chain n={n}: {t*1e3:.1f} ms  {fl/t/1e12:.1f} TFLOP/s sustained (wall)")
