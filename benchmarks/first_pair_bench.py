"""ONE gated on-chip receipt: fused first-layer pair conv(3→64)+conv(64→64).

VERDICT r3 next #4: the 3→64 first conv at the headline shape (b2048 128²)
is OUTPUT-bandwidth-bound — it writes a 4.3 GB bf16 intermediate that the
very next 64-wide conv immediately re-reads (kernel_notes.md r3 first-layer
receipts).  The rejected r3 double-conv receipt covered the 64→64→64 pair,
where compute dominates; this is the untried bandwidth-dominated shape where
keeping the intermediate in VMEM removes the dominant cost term
(~8.6 GB of the pair's ~13 GB HBM traffic).

Wedge-hazard protocol (CLAUDE.md): parity-gate each kernel variant on a
tiny batch first; probe the worker with a 60 s-timeout matmul between
variants; hard watchdog on the whole run.  Interpret-mode parity lives in
tests/test_pallas.py::test_double_conv_first_layer_c3.

Emits one JSON line per variant + a summary.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from celebrity_image_denoiser_tpu.core import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from celebrity_image_denoiser_tpu.ops.pallas import double_conv  # noqa: E402


def _watchdog(seconds):
    def fire():
        print(json.dumps({"bench": "first_pair", "error":
                          f"watchdog fired after {seconds}s"}), flush=True)
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def fence(y):
    np.asarray(jax.device_get(y.ravel()[0]))


def probe_alive(timeout_s=90) -> bool:
    """Tiny matmul with its own timeout: detects a wedged worker between
    kernel variants without hanging the whole bench."""
    done = {}

    def run():
        a = jnp.ones((128, 128), jnp.bfloat16)
        fence(a @ a)
        done["ok"] = True

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    return done.get("ok", False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--watchdog", type=int, default=2700)
    args = ap.parse_args()
    wd = _watchdog(args.watchdog)

    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 64)), jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)), jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.bfloat16)

    @jax.jit
    def xla_pair(x):
        import jax.lax as lax

        dn = lax.conv_dimension_numbers(x.shape, (3, 3, 3, 64),
                                        ("NHWC", "HWIO", "NHWC"))
        h = lax.conv_general_dilated(x, w1, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b1.astype(jnp.float32), 0).astype(jnp.bfloat16)
        dn2 = lax.conv_dimension_numbers(h.shape, (3, 3, 64, 64),
                                         ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(h, w2, (1, 1), "SAME",
                                     dimension_numbers=dn2,
                                     preferred_element_type=jnp.float32)
        return jnp.maximum(y + b2.astype(jnp.float32),
                           0).astype(jnp.bfloat16)

    # ---- parity gate on a tiny batch (compiled, NOT interpret) ------------
    x_small = jnp.asarray(rng.uniform(-1, 1, (8, args.size, args.size, 3)),
                          jnp.bfloat16)
    ref_small = np.asarray(xla_pair(x_small), np.float32)
    print(json.dumps({"bench": "first_pair", "note": "xla compiled ok"}),
          flush=True)

    def timed(fn, x):
        fence(fn(x))  # warm
        t0 = time.perf_counter()
        y = None
        for _ in range(args.iters):
            y = fn(x)
            # chain via a scalar tap (shapes differ in/out, so feed a
            # data-dependent zero back into the input instead)
            x = x + y.ravel()[0] * jnp.bfloat16(0.0)
        fence(y)
        return (time.perf_counter() - t0) / args.iters

    x_big = jnp.asarray(rng.uniform(-1, 1,
                                    (args.batch, args.size, args.size, 3)),
                        jnp.bfloat16)
    t_xla = timed(xla_pair, x_big)
    print(json.dumps({"bench": "first_pair", "variant": "xla_pair",
                      "ms": round(t_xla * 1e3, 2)}), flush=True)

    results = {"xla_pair": t_xla * 1e3}
    for kpack, tile_h in ((2, 16), (2, 32), (False, 16)):
        name = f"fused_kpack{int(kpack)}_t{tile_h}"  # 2 = conv2-only pack
        if not probe_alive():
            print(json.dumps({"bench": "first_pair", "error":
                              f"worker wedged before {name}"}), flush=True)
            break
        try:
            fn = jax.jit(lambda x, k=kpack, t=tile_h:
                         double_conv.double_conv3x3_relu(
                             x, w1, b1, w2, b2, tile_h=t, kpack=k))
            got = np.asarray(fn(x_small), np.float32)
            err = float(np.max(np.abs(got - ref_small)))
            if err > 0.15:  # bf16 pair tolerance on [-1,1]-ish activations
                print(json.dumps({"bench": "first_pair", "variant": name,
                                  "parity_err": err,
                                  "status": "FAILED parity"}), flush=True)
                continue
            t_k = timed(fn, x_big)
            results[name] = t_k * 1e3
            print(json.dumps({"bench": "first_pair", "variant": name,
                              "ms": round(t_k * 1e3, 2),
                              "parity_err": round(err, 4),
                              "speedup_vs_xla":
                              round(t_xla / t_k, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"bench": "first_pair", "variant": name,
                              "error": str(e)[:300]}), flush=True)

    best = min((v, k) for k, v in results.items())
    print(json.dumps({"bench": "first_pair", "batch": args.batch,
                      "size": args.size,
                      "best": best[1], "best_ms": round(best[0], 2),
                      "xla_ms": round(results["xla_pair"], 2)}), flush=True)
    wd.cancel()


if __name__ == "__main__":
    main()
