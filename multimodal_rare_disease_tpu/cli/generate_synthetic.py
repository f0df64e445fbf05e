"""Synthetic corpus generation CLI (parity: `src/synthetic_image_generator.py`
CLI `--network --outdir --num --trunc --seed`; the network pickle is
replaced by the built-in procedural generator)."""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Generate a class-conditional synthetic face corpus")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--num", type=int, default=5, help="images per class")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--trunc", type=float, default=0.7,
                        help="texture contrast (truncation_psi parity)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--foldered", action="store_true",
                        help="folder-per-class layout instead of flat")
    args = parser.parse_args(argv)

    from multimodal_rare_disease_tpu.data.synthetic import (
        SyntheticImageGenerator,
    )

    gen = SyntheticImageGenerator(args.size, args.seed, args.trunc)
    written = gen.generate_dataset(args.outdir, args.num,
                                   flat=not args.foldered)
    total = sum(len(v) for v in written.values())
    print(f"wrote {total} images ({args.num}/class) to {args.outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
