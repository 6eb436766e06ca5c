"""CLI: GAN inversion by optimizing input z-space style vectors
(reference projection_gaussian.py)."""

from __future__ import annotations

from histogan_tpu.cli.projection_common import build_parser, run


def main(argv=None):
    from histogan_tpu.utils.platform import setup_runtime

    setup_runtime()
    args = build_parser("./results_projection_gaussian").parse_args(argv)
    run(args, mode="gaussian")


if __name__ == "__main__":
    main()
