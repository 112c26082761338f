"""Multi-chip walkthrough: the three sharded execution paths on one mesh.

Demonstrates, on a virtual 8-device CPU mesh (no TPU pod needed — the
same code runs unchanged on real chips over ICI):

1. data-parallel GAN training  — batch sharded over the ``data`` axis,
   gradients psum'd by XLA (make_train_step(mesh=));
2. spatially-sharded inference — a tall image split across devices via
   GSPMD, bit-exact vs the single-device forward;
3. halo-exchange tiled inference — shard_map with true neighbor-row
   ppermute exchange (the CP/ring-attention slot of this framework,
   SURVEY.md §5 long-context).

    python examples/multichip.py            # forces 8 virtual CPU devices

On a real multi-chip host, drop the env forcing below and the mesh picks
up the actual devices.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "celebrity_image_denoiser_tpu")):
    sys.path.insert(0, _REPO)

import jax  # noqa: E402

if len(jax.devices()) < 2 and not os.environ.get("CID_MULTICHIP_CHILD"):
    # single visible device (e.g. a sitecustomize pre-imported jax pinned
    # to one chip): re-exec with a virtual 8-device CPU mesh — backend
    # config must land before Python starts (same trick as
    # __graft_entry__.dryrun_multichip)
    env = dict(os.environ,
               JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"),
               CID_MULTICHIP_CHILD="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from celebrity_image_denoiser_tpu import models, parallel
    from celebrity_image_denoiser_tpu.core import prng
    from celebrity_image_denoiser_tpu.train.gan_trainer import make_train_step

    n = len(jax.devices())
    print(f"[0/3] mesh over {n} devices ({jax.devices()[0].platform})")
    mesh = parallel.make_mesh()

    # -- 1. data-parallel training -----------------------------------------
    g, d = models.DenoiseGenerator(), models.DenoiseDiscriminator()
    init_fn, step_fn = make_train_step(g, d, family="denoise", mesh=mesh,
                                       on_the_fly_noise=True, donate=False)
    carry = jax.device_put(init_fn(prng.key(0)), parallel.replicated(mesh))
    clean = jax.device_put(
        jnp.asarray(np.random.default_rng(0)
                    .uniform(-1, 1, (2 * n, 32, 32, 3)).astype(np.float32)),
        parallel.batch_sharding(mesh))
    lr = jnp.float32(1e-4)
    for i in range(2):
        carry, m = step_fn(carry, clean, clean, prng.key(i), lr, lr)
    print(f"[1/3] DP train step over {n} devices: "
          f"g_loss={float(m['g_loss']):.4f} psnr={float(m['psnr']):.2f} dB")

    # -- 2. GSPMD spatially-sharded inference -------------------------------
    from jax.sharding import NamedSharding, PartitionSpec as P

    params, state = carry[0], carry[1]
    sp = parallel.spatial_sharded_apply(g, mesh)
    x = jax.device_put(jnp.zeros((1, 16 * n, 32, 3), jnp.float32),
                       NamedSharding(mesh, P(None, "data", None, None)))
    y_sharded = sp(params, state, x)
    # single-device reference: pull everything to host first so the jit
    # places it all on one device (params above are replicated mesh-wide)
    p_host, s_host = jax.device_get((params, state))
    y_single, _ = g.apply(p_host, s_host, jnp.asarray(np.asarray(x)),
                          train=False)
    max_diff = float(jnp.max(jnp.abs(y_sharded - jnp.asarray(y_single))))
    # float agreement is within ~1 ULP (the partitioned program may round
    # a reduction differently); serving is bit-exact at the uint8 output
    # level, which is what the suite's sharded-serving tests assert
    print(f"[2/3] spatially-sharded forward on a {x.shape[1]}-row image: "
          f"max |sharded - single| = {max_diff:.1e}")
    assert max_diff < 1e-6

    # -- 3. halo-exchange tiled inference ------------------------------------
    halo_fn = parallel.tiled_apply(g, params, state, mesh, halo=8)
    y_halo = halo_fn(jnp.zeros((1, 16 * n, 32, 3), jnp.float32))
    print(f"[3/3] ppermute-halo tiled forward: out {tuple(y_halo.shape)}, "
          f"finite={bool(jnp.all(jnp.isfinite(y_halo)))}")


if __name__ == "__main__":
    main()
