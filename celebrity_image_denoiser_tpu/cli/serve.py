"""Serving CLI: start the unified GAN API (stdlib server; use
--framework fastapi to run under uvicorn when installed)."""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="Serve the unified GAN API")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--weights-dir", default=None,
                   help="default: ./weights if present, else the repo's "
                        "committed weights/ (serve.handlers.default_weights_dir)")
    p.add_argument("--framework", default="stdlib", choices=["stdlib", "fastapi"])
    p.add_argument("--precompile", default=None,
                   help="comma-separated HxW sizes to precompile at startup "
                        "(e.g. 256x256,512x512) so first requests skip XLA "
                        "compile")
    p.add_argument("--spatial-shard", action="store_true",
                   help="multi-chip serving: run tall inputs height-sharded "
                        "over all devices (GSPMD, bit-exact) instead of the "
                        "sequential single-device tiler")
    p.add_argument("--tile-threshold-rows", type=int, default=2048,
                   help="inputs taller OR wider than this route through "
                        "tiled/sharded inference")
    p.add_argument("--microbatch-ms", type=float, default=None,
                   help="coalesce concurrent same-shape requests into one "
                        "device batch, waiting up to this many ms (off by "
                        "default; big throughput win under load)")
    p.add_argument("--microbatch-max", type=int, default=16)
    p.add_argument("--quantize", default="int8", choices=["off", "int8"],
                   help="int8 (default): post-training-quantized serving "
                        "forwards (per-channel weights, calibrated "
                        "activations; ops/quant.py).  Default-on since r4: "
                        "int8 beats the float step at EVERY batch occupancy "
                        "incl. batch 1 (1.07-2.05x isolated; 2.1x on the "
                        "mixed-shape load receipt, kernel_notes.md r4) at "
                        ">=40 dB agreement, gated by "
                        "test_quantized_serving_quality_gate; per-model "
                        "warn-and-continue falls back to float.  'off': "
                        "the float forwards (bit-parity with the reference)")
    from celebrity_image_denoiser_tpu.core.compile_cache import add_cli_arg

    add_cli_arg(p)
    return p


def _parse_sizes(parser, spec):
    sizes = []
    for tok in spec.split(","):
        tok = tok.strip().lower()
        if not tok:
            continue
        parts = tok.split("x")
        if len(parts) != 2 or not all(p.isdigit() for p in parts):
            parser.error(f"--precompile expects HxW sizes like 256x256, "
                         f"got {tok!r}")
        sizes.append((int(parts[0]), int(parts[1])))
    return sizes


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    from celebrity_image_denoiser_tpu.core.compile_cache import enable_from_arg

    enable_from_arg(args.compilation_cache)
    sizes = _parse_sizes(parser, args.precompile) if args.precompile else None

    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    mesh = None
    if args.spatial_shard:
        import jax

        if len(jax.devices()) > 1:
            from celebrity_image_denoiser_tpu.parallel import make_mesh

            mesh = make_mesh()
        else:
            from celebrity_image_denoiser_tpu.utils.logging import get_logger

            get_logger("cid_tpu.serve").warning(
                "--spatial-shard requested but only 1 device is visible — "
                "tall inputs will use the sequential single-device tiler")
    state = ServeState(weights_dir=args.weights_dir, mesh=mesh,
                       tile_threshold_rows=args.tile_threshold_rows,
                       microbatch_window_ms=args.microbatch_ms,
                       microbatch_max=args.microbatch_max,
                       quantize=None if args.quantize == "off"
                       else args.quantize)
    if args.framework == "fastapi":
        import uvicorn

        from celebrity_image_denoiser_tpu.serve.app import create_fastapi_app

        uvicorn.run(create_fastapi_app(state=state, precompile=sizes),
                    host=args.host, port=args.port)
    else:
        from celebrity_image_denoiser_tpu.serve.app import run_server

        run_server(args.host, args.port, state=state, precompile=sizes)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
