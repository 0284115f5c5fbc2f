#!/usr/bin/env python
"""Pack an ImageFolder tree into record files.

CLI-compatible with the reference (reference preprocess.py; README usage
``python preprocess.py IMAGENET_PATH train``) but writes the framework's
mmap-friendly .rec/.idx format instead of LMDB (not available on this image;
see vision_transformers_tpu/data/records.py for the layout).

    python preprocess.py /data/imagenet train   # → /data/imagenet/train.rec
    python preprocess.py /data/imagenet val --out valid
"""

import argparse
import os

from vision_transformers_tpu.data.records import pack_image_folder


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("path", help="dataset root containing the split directory")
    parser.add_argument("split", nargs="?", default="train",
                        help="split subdirectory (class-per-dir tree)")
    parser.add_argument("--out", default=None,
                        help="output name (default: the split name)")
    args = parser.parse_args()

    out = os.path.join(args.path, args.out or args.split)
    pack_image_folder(os.path.join(args.path, args.split), out)


if __name__ == "__main__":
    main()
