#!/usr/bin/env python
"""Filter a ShapeNet index by synset blacklist.

Behavioral reference: ``tools/dataset/filter_shapenet.py`` +
``datasets/training/shapenet.py`` taxonomy blacklist handling.
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

from latentfusion_tpu.data.synthetic import ShapeNetDataset  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset_dir", type=Path)
    parser.add_argument("--blacklist", type=Path,
                        help="JSON list of synset ids to exclude")
    parser.add_argument("--out", type=Path, default=None)
    args = parser.parse_args()

    blacklist = None
    if args.blacklist:
        with open(args.blacklist) as f:
            blacklist = json.load(f)

    ds = ShapeNetDataset(args.dataset_dir, blacklist_synsets=blacklist,
                         num_input_views=1, num_output_views=1)
    out = args.out or (args.dataset_dir / "paths.txt")
    with open(out, "w") as f:
        for p in ds.shape_paths:
            f.write(str(Path(p).relative_to(args.dataset_dir)) + "\n")
    print(f"wrote {len(ds.shape_paths)} paths to {out}")


if __name__ == "__main__":
    main()
