#!/usr/bin/env python
"""Convert an official torch ``.pt`` Whisper checkpoint to whisper_tpu formats.

Usage:
    python scripts/convert_checkpoint.py model.pt out.npz
    python scripts/convert_checkpoint.py model.pt out_dir --format orbax

The output loads without torch via ``whisper_tpu.load_model(path)`` (npz) or
``whisper_tpu.models.load.load_orbax`` (orbax; supports sharded restore on
multi-chip meshes).
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("src", help="torch .pt checkpoint")
    parser.add_argument("dst", help="output path (.npz file or orbax dir)")
    parser.add_argument("--format", choices=["npz", "orbax"], default="npz")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from whisper_tpu.models.load import (
        load_torch_checkpoint,
        save_npz,
        save_orbax,
    )

    params, dims = load_torch_checkpoint(args.src)
    if args.format == "npz":
        save_npz(args.dst, params, dims)
    else:
        save_orbax(args.dst, params, dims)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"converted {args.src} -> {args.dst} ({n_params:,} parameters, {dims})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
