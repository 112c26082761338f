"""Serving CLI: start the unified GAN API (stdlib server; use
--framework fastapi to run under uvicorn when installed)."""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="Serve the unified GAN API")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--weights-dir", default="weights")
    p.add_argument("--framework", default="stdlib", choices=["stdlib", "fastapi"])
    p.add_argument("--precompile", default=None,
                   help="comma-separated HxW sizes to precompile at startup "
                        "(e.g. 256x256,512x512) so first requests skip XLA "
                        "compile")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.framework == "fastapi":
        import uvicorn

        from celebrity_image_denoiser_tpu.serve.app import create_fastapi_app

        uvicorn.run(create_fastapi_app(args.weights_dir),
                    host=args.host, port=args.port)
    else:
        from celebrity_image_denoiser_tpu.serve.app import make_server
        from celebrity_image_denoiser_tpu.serve.handlers import ServeState
        from celebrity_image_denoiser_tpu.utils.logging import get_logger

        state = ServeState(weights_dir=args.weights_dir)
        if args.precompile:
            sizes = []
            for tok in args.precompile.split(","):
                h, w = tok.lower().split("x")
                sizes.append((int(h), int(w)))
            state.warmup(tuple(sizes))
        server = make_server(args.host, args.port, state=state)
        get_logger("cid_tpu.serve.http").info(
            "Unified GAN API listening on %s:%d", args.host, args.port)
        server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
