#!/bin/bash
# Process a raw Realsense capture directory into a training/eval-ready scene
# (behavioral analog of the reference's process_realsense_scan.sh, which
# glued machine-specific UOIS + Open3D installs; this version uses the
# in-repo tools).
#
# Usage: tools/dataset/process_scan.sh <capture-dir> [<chroma-hue>]
#
# Expects <capture-dir>/{color,depth}/ from tools/dataset/record_realsense.py
# plus scene/trajectory.log + scene/integrated_cropped.ply from your
# reconstruction pipeline (e.g. Open3D's ReconstructionSystem).
set -e

DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" >/dev/null 2>&1 && pwd)"
CAPTURE="$1"
HUE="${2:-120}"

if [[ -z "$CAPTURE" ]]; then
  echo "usage: $0 <capture-dir> [<chroma-hue>]" >&2
  exit 1
fi

if [[ ! -d "$CAPTURE/mask" ]]; then
  echo "*** Generating chroma-key masks (hue=$HUE)"
  python "$DIR/chroma_mask.py" "$CAPTURE" --hue "$HUE"
else
  echo "*** Masks already exist"
fi

# Optional: register this capture against a reference scan of the same
# object with tools/dataset/align_scenes.py <source> <target> (writes
# registration/registration.json consumed by data/realsense.py).

echo "*** Building evaluation pointcloud"
python "$DIR/moped_eval_pointclouds.py" --dataset-dir "$(dirname "$CAPTURE")"

echo "*** Done: $CAPTURE"
