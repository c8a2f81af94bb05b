"""Dataset preparation CLI (mirrors the reference's data/ scripts).

Subcommands:
  square    content-aware square crop of every image (data/cut_to_square.py)
  metadata  build data_info.csv (data/create_metadata.py)
  rename    strip problem characters from filenames (data/rename_images.py)
  unload    unzip checkpoint archives (data/checkpoint_unloader.py)
"""

from __future__ import annotations

import argparse
import os

from pgx.data import prep


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sq = sub.add_parser("square", help="content-aware square crop")
    sq.add_argument("--src", required=True)
    sq.add_argument("--dst", required=True)

    md = sub.add_parser("metadata", help="build data_info.csv")
    md.add_argument("--root", required=True)
    md.add_argument("--out", default="data_info.csv")

    rn = sub.add_parser("rename", help="sanitize filenames")
    rn.add_argument("--root", required=True)

    ul = sub.add_parser("unload", help="unzip checkpoint archives")
    ul.add_argument("--archives", required=True)
    ul.add_argument("--out", required=True)

    args = p.parse_args(argv)

    if args.cmd == "square":
        os.makedirs(args.dst, exist_ok=True)
        n = 0
        for dirpath, _, names in os.walk(args.src):
            rel = os.path.relpath(dirpath, args.src)
            for name in names:
                if not name.lower().endswith(prep._IMG_EXTS):
                    continue
                img = prep.load_image(os.path.join(dirpath, name))
                out_dir = os.path.join(args.dst, rel)
                os.makedirs(out_dir, exist_ok=True)
                prep.save_image(os.path.join(out_dir, name),
                                prep.cut_to_square(img))
                n += 1
        print(f"cropped {n} images")
    elif args.cmd == "metadata":
        n = prep.create_metadata(args.root, args.out)
        print(f"wrote {args.out} ({n} rows)")
    elif args.cmd == "rename":
        n = prep.rename_images(args.root)
        print(f"renamed {n} files")
    elif args.cmd == "unload":
        n = prep.unload_checkpoints(args.archives, args.out)
        print(f"extracted {n} model files")


if __name__ == "__main__":
    main()
