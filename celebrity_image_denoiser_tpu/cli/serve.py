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
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.framework == "fastapi":
        import uvicorn

        from celebrity_image_denoiser_tpu.serve.app import create_fastapi_app

        uvicorn.run(create_fastapi_app(args.weights_dir),
                    host=args.host, port=args.port)
    else:
        from celebrity_image_denoiser_tpu.serve.app import run_server

        run_server(args.host, args.port, weights_dir=args.weights_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
