import time
import numpy as np, jax, jax.numpy as jnp
from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.models.inference import make_inference_model, plan_from_config
from realtime_style_transfer_tpu.models.transfer_packed import stylize_packed

cfg = ShapeConfig.from_spec("rst-960-120-128-17")
plan = plan_from_config(cfg)
model = make_inference_model(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
c1 = jax.random.uniform(rng, (1,) + cfg.content_shape, jnp.float32)
style = jax.random.uniform(rng, (1,) + cfg.style_shape, jnp.float32)
variables = jax.jit(model.init, static_argnames=("train",))(rng, c1, style, train=False)
sp1 = jax.jit(lambda v, s: model.apply(v, s, method=model.predict_style_params))(variables, style)

def measure(batch, k_short=10, k_long=40):
    content = jnp.broadcast_to(c1, (batch,) + cfg.content_shape) + 0.0
    sp = jnp.broadcast_to(sp1, (batch,) + sp1.shape[1:]) + 0.0
    def stream(variables, content, sp, k):
        def step(carry, _):
            out = stylize_packed(variables, carry, sp, plan=plan, dtype=jnp.bfloat16)
            m = jnp.mean(out).astype(carry.dtype)
            carry = jax.lax.dynamic_update_slice(carry, m[None,None,None,None], (0,0,0,0))
            return carry, jnp.mean(out)
        _, means = jax.lax.scan(step, content, None, length=k)
        return jnp.sum(means)
    def best(k):
        f = jax.jit(lambda v, c, s: stream(v, c, s, k))
        float(jax.device_get(f(variables, content, sp)))
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(jax.device_get(f(variables, content, sp))); b = min(b, time.perf_counter()-t0)
        return b
    per_iter = (best(k_long) - best(k_short)) / (k_long - k_short)
    fps = batch / per_iter
    print({"batch": batch, "iter_ms": round(per_iter*1e3,2), "frames_per_sec": round(fps,1)}, flush=True)

for b in (1, 2, 4, 8):
    measure(b)
