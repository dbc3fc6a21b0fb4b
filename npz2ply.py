#!/usr/bin/env python
"""npz -> ply converter (de-indexes codebooks to dense attributes).

Parity: npz2ply.py:1-21."""
import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("input", type=str, help="compressed .npz")
    parser.add_argument("output", type=str, help="output .ply")
    parser.add_argument("--sh_degree", type=int, default=3)
    args = parser.parse_args(argv)

    from c3dgs_tpu.models import io_npz, io_ply

    scene = io_npz.load_npz(
        args.input, max_sh_degree=args.sh_degree, override_quantization=True
    )
    scene = scene.to_unindexed()
    io_ply.save_gaussians_ply(scene, args.output)
    print(f"wrote {args.output} ({scene.capacity} splats)")


if __name__ == "__main__":
    main()
