"""Convert reference ``GAN_save/*.pth`` checkpoints into this framework's
format (see utils/torch_import.py).

Run: ``python -m gan_ffn_tpu.cli.import_reference --src ./GAN_save --dst ./GAN_save_jax``
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Import reference .pth GAN checkpoints")
    p.add_argument("--src", default="./GAN_save", help="directory with *.pth files")
    p.add_argument("--dst", default="./GAN_save_jax", help="output directory")
    p.add_argument("--reference", default="/root/reference",
                   help="path to the reference source tree (needed to unpickle)")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    from ..utils.torch_import import import_gan_save

    written = import_gan_save(args.src, args.dst, args.reference)
    for name, path in written.items():
        print(f"{name} -> {path}")
    if not written:
        print(f"no .pth checkpoints found in {args.src}")
    return written


if __name__ == "__main__":
    main()
