"""Measure whether a closed-form two-vector-orientation Jacobian is
warranted (VERDICT r4 missing #1) — the distorted-Jacobian template."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from davo_tpu.geometry import two_vector_rotation_matrix, two_vector_rotation_jacobian

B = 16384
key = jax.random.key(0)
a = jax.random.normal(key, (B, 3))
b = jax.random.normal(jax.random.fold_in(key, 1), (B, 3))

def slope(fn, reps_long=128):
    def chained(reps):
        @jax.jit
        def run(x):
            def body(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out)
        float(run((a, b))[()] if False else run((a, b)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(run((a, b))); best = min(best, time.perf_counter() - t0)
        return best
    tl, t1 = chained(reps_long), chained(1)
    per = (tl - t1) / (reps_long - 1)
    return per if per > 0 else tl / reps_long

def value_step(x):
    a_, b_ = x
    r = two_vector_rotation_matrix(a_, b_)
    return (a_ + 1e-9 * r[..., 0], b_ + 1e-9 * r[..., 1])

def jac_step(x):
    a_, b_ = x
    ja, jb = jax.vmap(two_vector_rotation_jacobian)(a_, b_)
    return (a_ + 1e-9 * ja[..., 0, 0, :], b_ + 1e-9 * jb[..., 0, 0, :])

tv = slope(value_step)
tj = slope(jac_step)
print(json.dumps({"platform": jax.devices()[0].platform, "batch": B,
  "value_ms": round(tv*1e3, 4), "value_and_jac_ms": round(tj*1e3, 4),
  "overhead_x": round(tj/tv, 2)}))
