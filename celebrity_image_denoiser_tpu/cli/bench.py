"""Benchmark CLI — delegates to the repo-root bench harness (one JSON line)."""

from __future__ import annotations


def main(argv=None) -> int:
    import argparse
    import importlib.util
    import os

    # --help must answer without touching the device (the bench itself
    # compiles on the TPU and can take minutes on a cold worker)
    argparse.ArgumentParser(
        description="Run the headline bench (128² denoises/sec/chip) on the "
                    "default backend and print one JSON line "
                    "{metric, value, unit, vs_baseline}."
    ).parse_args(argv)
    root_bench = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "bench.py")
    spec = importlib.util.spec_from_file_location("cid_bench", root_bench)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
