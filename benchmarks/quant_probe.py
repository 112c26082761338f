"""Round-3 probe: int8-quantized serving step vs bf16 at the headline config."""
import os, sys, time
import numpy as np
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax, jax.numpy as jnp
from celebrity_image_denoiser_tpu import models
from celebrity_image_denoiser_tpu.core import prng
from celebrity_image_denoiser_tpu.ops import quant
from celebrity_image_denoiser_tpu.ckpt import load_checkpoint

model = models.DenoiseGenerator()
params, state = model.init(prng.key(0))
sections, _ = load_checkpoint(os.path.join(_REPO, "weights", "denoise"))
params = sections.get("generator", params)
state = sections.get("generator_state", state) or state

B = 2048
rng = np.random.default_rng(0)
x_u8 = jax.device_put(rng.integers(0, 256, (B,128,128,3), dtype=np.uint8))

bf16_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

def make_step(apply_fn, p):
    @jax.jit
    def step(x_uint8):
        x = x_uint8.astype(jnp.bfloat16) * (2.0/255.0) - 1.0
        y = apply_fn(p, x)
        y01 = jnp.clip(y * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(y01 * 255.0).astype(jnp.uint8)
    return step

# bf16 baseline (the current headline path)
step_bf16 = make_step(lambda p, x: model.apply(p, state, x, train=False)[0], bf16_params)

# int8: calibrate on the serving domain ([-1,1] noisy-ish images)
calib = (jnp.asarray(rng.integers(0,256,(16,128,128,3),dtype=np.uint8), jnp.float32)
         * (2.0/255.0) - 1.0)
qapply = quant.quantize_apply(model, params, state, calib)
step_i8 = make_step(lambda p, x: qapply(x), None)

def bench(step, label, iters=10):
    y = step(x_u8); np.asarray(jax.device_get(y[0,0,0,0]))
    # chain: feed output back so work can't elide
    t0 = time.perf_counter()
    v = x_u8
    for _ in range(iters):
        v = step(v)
    np.asarray(jax.device_get(v[0,0,0,0]))
    dt = (time.perf_counter()-t0)/iters
    print(f"{label}: {B/dt:,.0f} imgs/s  ({dt*1e3:.1f} ms/step)", flush=True)
    return B/dt

r_b = bench(step_bf16, "bf16 serve_step")
r_i = bench(step_i8,   "int8 serve_step")
print(f"speedup: {r_i/r_b:.2f}x", flush=True)
# quality: agreement vs the f32 forward on a real noisy fixture
x_small = x_u8[:8]
yb = np.asarray(jax.device_get(step_bf16(x_small))).astype(np.float32)
yi = np.asarray(jax.device_get(step_i8(x_small))).astype(np.float32)
mse = float(np.mean((yb-yi)**2))
print("int8-vs-bf16 agreement PSNR (u8 domain): %.1f dB" % (10*np.log10(255.0**2/max(mse,1e-9))), flush=True)
